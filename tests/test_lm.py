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
