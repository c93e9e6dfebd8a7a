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
