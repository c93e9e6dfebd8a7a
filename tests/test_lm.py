"""CCNet-style bigram-LM perplexity scoring (operators/lm.py)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from mizzounewscrawler_spark.operators.lm import (
    ccnet_buckets,
    ngram_lm,
    perplexity,
)


def test_perplexity_hand_computed(spark):
    """2-doc corpus, score one doc, check against the by-hand add-k math."""
    corpus = spark.createDataFrame(
        [("a b",), ("a b",)], "text string"
    )
    lm = ngram_lm(corpus)
    # transitions over the corpus: (<s>,a)×2, (a,b)×2
    rows = {(r["prev"], r["word"]): (r["c_bigram"], r["c_prev"], r["vocab"])
            for r in lm.collect()}
    assert rows == {("<s>", "a"): (2, 2, 2), ("a", "b"): (2, 2, 2)}

    doc = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    got = perplexity(doc, lm, k=0.1).collect()[0]
    # P(a|<s>) = P(b|a) = (2+0.1)/(2+0.1*3) = 2.1/2.3
    p = 2.1 / 2.3
    want = 2 ** (-(math.log2(p) + math.log2(p)) / 2)
    assert got["n_tokens"] == 2
    assert got["ppl"] == pytest.approx(round(want, 4))


def test_perplexity_single_token_and_empty_docs(spark):
    corpus = spark.createDataFrame([("x y",), ("x",)], "text string")
    lm = ngram_lm(corpus)
    docs = spark.createDataFrame(
        [(1, "x"), (2, ""), (3, None), (4, "zz unseen")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in perplexity(docs, lm).collect()}
    # 1-token doc scores exactly the (<s>, x) transition
    assert out[1]["n_tokens"] == 1
    # empty / null docs produce no transitions → dropped
    assert 2 not in out and 3 not in out
    # fully-unseen doc still scores via the smoothed backoff (high ppl)
    assert out[4]["ppl"] > out[1]["ppl"]


def test_ccnet_buckets_order_and_fractions(spark):
    # 10 docs per lang with known distinct ppls → head = lowest 10%… but
    # with n=10, the 0.1-quantile threshold is interpolated; just pin the
    # ordering contract: every head ppl < every middle ppl < every tail ppl
    rows = [(i, "en", 10, float(10 + i)) for i in range(10)]
    rows += [(100 + i, "es", 10, float(50 + 5 * i)) for i in range(10)]
    scored = spark.createDataFrame(
        rows, "doc_id int, lang string, n_tokens int, ppl double"
    )
    out = ccnet_buckets(scored, by="lang").collect()
    for lang in ("en", "es"):
        by_bucket = {}
        for r in out:
            if r["lang"] == lang:
                by_bucket.setdefault(r["bucket"], []).append(r["ppl"])
        assert set(by_bucket) == {"head", "middle", "tail"}
        assert max(by_bucket["head"]) <= min(by_bucket["middle"])
        assert max(by_bucket["middle"]) <= min(by_bucket["tail"])


def test_lm_scoring_plan_shape(spark):
    """The scoring join must broadcast the LM — no shuffle of the doc-side
    transitions onto LM keys, no cartesian product beyond the 1-row vocab
    broadcast."""
    corpus = spark.createDataFrame([("a b c d e",)], "text string")
    docs = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    plan = (
        perplexity(docs, ngram_lm(corpus))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_perplexity_smooths_with_seen_context_unseen_bigram(spark):
    """A transition with a seen CONTEXT but unseen bigram must include
    c(prev) in the smoothing denominator — i.e. be LESS probable than the
    same-context seen bigram, and less probable than under a fresh
    context."""
    corpus = spark.createDataFrame([("a b a b a b",)], "text string")
    lm = ngram_lm(corpus)
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a z")], "doc_id int, text string"
    )
    out = {r["doc_id"]: r["ppl"] for r in perplexity(docs, lm).collect()}
    # doc 2's (a, z) has c(a b)=0 but c(a)=3: P = k/(3 + k(V+1)) — with a
    # bugged (prev,word)-only join the denominator would be k(V+1) and
    # P would be uniform 1/(V+1), UNDER-penalizing the unseen bigram
    import math
    k, V = 0.1, 2
    # transitions of corpus: (<s>,a) c=1, (a,b) c=3, (b,a) c=2
    p_s_a = (1 + k) / (1 + k * (V + 1))
    p_a_b = (3 + k) / (3 + k * (V + 1))
    p_a_z = (0 + k) / (3 + k * (V + 1))
    want1 = 2 ** (-(math.log2(p_s_a) + math.log2(p_a_b)) / 2)
    want2 = 2 ** (-(math.log2(p_s_a) + math.log2(p_a_z)) / 2)
    assert out[1] == pytest.approx(round(want1, 4))
    assert out[2] == pytest.approx(round(want2, 4))


def test_dsir_weights_and_deterministic_resample(spark):
    from mizzounewscrawler_spark.operators.lm import dsir_resample, dsir_weights

    target = spark.createDataFrame(
        [("clean prose about science " * 5,)] * 3, "text string"
    )
    raw = spark.createDataFrame(
        [("clean prose about science " * 5,), ("spam spam buy now " * 5,)],
        "text string",
    )
    docs = spark.createDataFrame(
        [(1, "clean prose about science " * 5), (2, "spam spam buy now " * 5)],
        "doc_id int, text string",
    )
    w = dsir_weights(docs, ngram_lm(target), ngram_lm(raw))
    ratios = {r["doc_id"]: r["log_ratio"] for r in w.collect()}
    # the target-like doc carries the higher importance weight
    assert ratios[1] > ratios[2]

    out1 = dsir_resample(w, keep_frac=0.5).collect()
    out2 = dsir_resample(w, keep_frac=0.5).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))  # deterministic
    kept = {r["doc_id"] for r in out1 if r["kept"]}
    assert len(kept) == 1  # ~50% of 2 docs, ties excluded at the cut


def test_token_chi2_identical_slices_near_zero(spark):
    """Two slices with identical token distributions diverge ~0 from the
    pool; a skewed third slice dominates the statistic."""
    from mizzounewscrawler_spark.operators.lm import token_chi2_by_slice

    rows = [("a", "x y z x y z"), ("b", "x y z x y z"),
            ("c", "q q q q q q")]
    out = {r["s"]: r for r in token_chi2_by_slice(
        spark.createDataFrame(rows, "s string, text string"), "s"
    ).collect()}
    assert abs(out["a"]["chi2"] - out["b"]["chi2"]) < 1e-9
    assert out["c"]["chi2"] > out["a"]["chi2"]
    # hand check slice c: o=6 on token q, pooled c=6, n=18, n_s=6:
    # chi2 = 18/6 * 36/6 - 6 = 12
    assert out["c"]["chi2"] == 12.0


def test_token_chi2_catalog_oracle_parity(spark):
    import duckdb

    from mizzounewscrawler_spark.plans.relational import (
        SQL_SLICE_DIVERGENCE,
        q_slice_divergence,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(tuple(r) for r in q_slice_divergence(spark, sf).collect())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = sorted(tuple(r) for r in con.sql(SQL_SLICE_DIVERGENCE).fetchall())
    assert got == want
    assert all(r[2] >= 0 for r in got)
