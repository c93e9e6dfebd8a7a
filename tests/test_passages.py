"""Passage-level corpus hygiene: C4-style repeated-passage removal,
benchmark n-gram decontamination, and mixture-weight sampling semantics
(the oracle parity for all three lives in test_entry_oracle.py)."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mizzounewscrawler_spark.operators.passages import (  # noqa: E402
    decontaminate,
    explode_passages,
    passage_dedup,
)
from mizzounewscrawler_spark.operators.sampling import (  # noqa: E402
    mixture_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_passage_windows_cover_text_exactly(spark):
    # 23 tokens, window 10 → 3 passages (10, 10, 3); rejoined = original
    text = " ".join(f"w{i}" for i in range(23))
    p = explode_passages(_docs(spark, [(1, text)]), "text", "doc_id", 10)
    rows = sorted(p.collect(), key=lambda r: r["pos"])
    assert [len(r["passage"].split()) for r in rows] == [10, 10, 3]
    assert " ".join(r["passage"] for r in rows) == text


def test_passage_dedup_drops_shared_keeps_unique(spark):
    shared = " ".join(f"s{i}" for i in range(10))
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(10))
    d = _docs(
        spark,
        [
            (1, f"{uniq_a} {shared}"),
            (2, f"{shared} {uniq_b}"),
            (3, uniq_b),  # uniq_b now appears in docs 2 and 3 → boilerplate
        ],
    )
    out = {r["doc_id"]: r for r in passage_dedup(d, "text", "doc_id", 10).collect()}
    assert out[1]["clean_text"] == uniq_a and out[1]["n_dropped"] == 1
    assert out[2]["clean_text"] == "" and out[2]["n_dropped"] == 2
    assert out[3]["clean_text"] == "" and out[3]["n_passages"] == 1
    # every input doc comes back exactly once, even fully-boilerplate ones
    assert set(out) == {1, 2, 3}


def test_passage_dedup_within_doc_repeat_not_boilerplate(spark):
    # the same passage twice in ONE doc is not corpus boilerplate
    # (min_docs counts distinct documents, not occurrences)
    p = " ".join(f"x{i}" for i in range(10))
    d = _docs(spark, [(1, f"{p} {p}")])
    row = passage_dedup(d, "text", "doc_id", 10).collect()[0]
    assert row["n_dropped"] == 0 and row["clean_text"] == f"{p} {p}"


def test_decontaminate_flags_overlap_only(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    corpus = _docs(
        spark,
        [
            (1, "a quick brown fox jumps here today"),  # 'quick brown fox jumps'
            (2, "the quick brown fox ran away"),  # 'the quick brown fox'
            (3, "completely different words entirely present"),
        ],
    )
    hits = {
        r["doc_id"]: r["n_matched"]
        for r in decontaminate(corpus, bench, "text", "doc_id", n=4).collect()
    }
    assert hits == {1: 1, 2: 1}  # doc 3 absent = clean


def test_mixture_sample_monotone_and_deterministic(spark):
    d = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("src"),
    )
    lo = set(
        r["doc_id"]
        for r in mixture_sample(d, "src", "doc_id", {"a": 25, "b": 100}).collect()
    )
    hi = set(
        r["doc_id"]
        for r in mixture_sample(d, "src", "doc_id", {"a": 75, "b": 100}).collect()
    )
    assert lo < hi  # raising a rate only ADDS rows (monotone reweighting)
    assert all(i in hi for i in range(1, 2000, 2))  # b at 100% kept whole
    again = set(
        r["doc_id"]
        for r in mixture_sample(
            d.repartition(7), "src", "doc_id", {"a": 25, "b": 100}
        ).collect()
    )
    assert again == lo  # partitioning-independent
    n_a = sum(1 for i in lo if i % 2 == 0)
    assert 0.18 <= n_a / 1000 <= 0.32  # ~25% of the 1000 'a' rows


# ----------------------- ExactSubstr sliding spans -----------------------


def test_exact_substring_dedup_cross_boundary_span(spark):
    """A 10-token run shared at DIFFERENT offsets (crossing any fixed
    window boundary) is removed from both docs; unique text survives."""
    from mizzounewscrawler_spark.operators.passages import (
        exact_substring_dedup,
    )

    run = " ".join(f"w{i}" for i in range(10))
    rows = [
        (1, f"alpha beta {run} gamma"),
        (2, f"{run} delta epsilon zeta"),
        (3, "totally different text with no repeats at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in exact_substring_dedup(
            df, "text", "doc_id", window=10, min_docs=2
        ).collect()
    }
    assert out[1]["clean_text"] == "alpha beta gamma"
    assert out[1]["n_removed"] == 10
    assert out[2]["clean_text"] == "delta epsilon zeta"
    assert out[3]["n_removed"] == 0
    assert out[3]["clean_text"] == rows[2][1]


def test_exact_substring_dedup_short_docs_survive_whole(spark):
    from mizzounewscrawler_spark.operators.passages import (
        exact_substring_dedup,
    )

    rows = [(1, "same short text"), (2, "same short text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = exact_substring_dedup(
        df, "text", "doc_id", window=10, min_docs=2
    ).collect()
    assert all(r["n_removed"] == 0 for r in out)
    assert all(r["clean_text"] == "same short text" for r in out)


def test_exact_substring_dedup_within_doc_repeat_not_removed(spark):
    """min_docs counts DISTINCT documents: a run repeated twice inside ONE
    doc is not cross-document boilerplate and must survive."""
    from mizzounewscrawler_spark.operators.passages import (
        exact_substring_dedup,
    )

    run = " ".join(f"r{i}" for i in range(6))
    df = spark.createDataFrame(
        [(1, f"{run} mid {run}"), (2, "unrelated words entirely here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in exact_substring_dedup(
        df, "text", "doc_id", window=6, min_docs=2
    ).collect()}
    assert out[1]["n_removed"] == 0


def test_exact_substring_catalog_oracle_parity(spark):
    import duckdb

    from mizzounewscrawler_spark.plans.relational import (
        SQL_EXACT_SUBSTRING,
        q_exact_substring_dedup,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r) for r in q_exact_substring_dedup(spark, sf).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = sorted(tuple(r) for r in con.sql(SQL_EXACT_SUBSTRING).fetchall())
    assert got == want
    # the fixture's near-dup docs must actually trigger span removal
    assert any(r[2] > 0 for r in got)


def test_exact_substring_xxhash64_key_output_parity(spark):
    """The scale-path window-key hash (8-byte longs instead of 32-char md5
    hex) must produce IDENTICAL dedup output — keys never leave the
    operator."""
    from mizzounewscrawler_spark.operators.passages import (
        exact_substring_dedup,
    )

    shared = " ".join(f"dup{i}" for i in range(25))
    rows = [
        (1, "alpha " * 10 + shared + " omega tail one"),
        (2, "beta " * 12 + shared + " closing words two"),
        (3, " ".join(f"solo{i}" for i in range(40))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def run(kh):
        return sorted(
            map(
                tuple,
                exact_substring_dedup(
                    df, "text", "doc_id", window=20, key_hash=kh
                ).collect(),
            )
        )

    a, b = run("md5"), run("xxhash64")
    assert a == b
    assert any(r[2] > 0 for r in a)  # the shared span was actually removed

    import pytest as _pytest

    with _pytest.raises(ValueError):
        exact_substring_dedup(df, "text", "doc_id", key_hash="sha1")
