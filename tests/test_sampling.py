"""Deterministic sampling operators: hash splits + stratified per-group caps.

The oracle parity of the three catalog entries (corpus_split,
stratified_sample, group_percentiles) is covered by test_entry_oracle; these
tests pin the operator-level contracts the oracle can't see: partitioning
invariance, disjoint/exhaustive splits, the two-phase prune, and the
integer-rank quantile edge cases.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mizzounewscrawler_spark.operators.sampling import (
    BUCKETS,
    hash_split,
    split_thresholds,
    stratified_sample,
)
from mizzounewscrawler_spark.operators.sketches import exact_group_quantiles


def test_split_thresholds_integer_bounds():
    th = split_thresholds({"train": 80, "val": 10, "test": 10})
    assert th == [("train", 52428), ("val", 58982), ("test", BUCKETS)]
    with pytest.raises(ValueError):
        split_thresholds({"a": 50, "b": 49})


def test_hash_split_matches_reference_md5(spark):
    """The bucket is the md5 of the stringified id — pinned against
    hashlib so the assignment can never drift with engine internals."""
    df = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    got = {
        r["doc_id"]: r["split"]
        for r in hash_split(df, "doc_id", {"train": 80, "val": 10, "test": 10})
        .collect()
    }
    for i in range(200):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16)
        want = "train" if b < 52428 else ("val" if b < 58982 else "test")
        assert got[i] == want, i


def test_hash_split_stable_under_repartition(spark):
    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    w = {"train": 80, "val": 10, "test": 10}
    a = hash_split(df.repartition(1), "doc_id", w).collect()
    b = hash_split(df.repartition(17), "doc_id", w).collect()
    assert {(r["doc_id"], r["split"]) for r in a} == {
        (r["doc_id"], r["split"]) for r in b
    }
    # no shuffle: the split is a project over the scan
    plan = hash_split(df, "doc_id", w)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_hash_split_roughly_proportional(spark):
    df = spark.range(0, 20000).select(F.col("id").alias("doc_id"))
    counts = dict(
        hash_split(df, "doc_id", {"train": 80, "val": 10, "test": 10})
        .groupBy("split")
        .count()
        .collect()
    )
    assert sum(counts.values()) == 20000  # exhaustive + disjoint
    assert abs(counts["train"] / 20000 - 0.80) < 0.02
    assert abs(counts["val"] / 20000 - 0.10) < 0.01
    assert abs(counts["test"] / 20000 - 0.10) < 0.01


def test_stratified_sample_partitioning_invariant(spark):
    df = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("grp")
    )
    a = stratified_sample(df.repartition(1), "grp", 5, "doc_id").collect()
    b = stratified_sample(df.repartition(23), "grp", 5, "doc_id").collect()
    key = lambda rows: sorted((r["grp"], r["sample_rank"], r["doc_id"]) for r in rows)
    assert key(a) == key(b)
    # exactly k per group (every group here has >= k members), ranks 1..k
    per = {}
    for r in a:
        per.setdefault(r["grp"], []).append(r["sample_rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per.values())


def test_stratified_sample_matches_naive_global_window(spark):
    """Two-phase prune == the naive single-window answer."""
    from pyspark.sql import Window

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("grp")
    ).repartition(13)
    got = {
        (r["grp"], r["sample_rank"], r["doc_id"])
        for r in stratified_sample(df, "grp", 8, "doc_id").collect()
    }
    w = Window.partitionBy("grp").orderBy(F.md5(F.col("doc_id").cast("string")))
    want = {
        (r["grp"], r["sample_rank"], r["doc_id"])
        for r in df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= 8)
        .collect()
    }
    assert got == want


def test_stratified_sample_small_groups_kept_whole(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], ["doc_id", "grp"]
    )
    rows = stratified_sample(df, "grp", 10, "doc_id").collect()
    assert len(rows) == 3
    assert {r["sample_rank"] for r in rows if r["grp"] == "a"} == {1, 2}


def test_exact_group_quantiles_integer_rank_semantics(spark):
    # n=4 (lower variant): p50 idx = (3*50) div 100 + 1 = 2 -> 2nd value;
    # p99 idx = (3*99) div 100 + 1 = 3 -> 3rd value; p100 would be the max
    df = spark.createDataFrame(
        [("g", i, float(v)) for i, v in enumerate([10, 20, 30, 40])],
        ["grp", "tid", "v"],
    )
    row = exact_group_quantiles(df, "grp", "v", "tid", [50, 99, 100]).collect()[0]
    assert row["n"] == 4 and row["p50"] == 20.0
    assert row["p99"] == 30.0 and row["p100"] == 40.0
    # single element: every percentile is that element
    one = spark.createDataFrame([("h", 0, 7.0)], ["grp", "tid", "v"])
    r1 = exact_group_quantiles(one, "grp", "v", "tid", [50, 95]).collect()[0]
    assert r1["p50"] == 7.0 and r1["p95"] == 7.0


def test_global_shuffle_deterministic_and_partitioning_invariant(spark):
    """The md5-keyed shuffle order and shard assignment are identical
    under any input partitioning and on rerun, and decorrelate the
    input order (not the identity permutation)."""
    import hashlib

    from mizzounewscrawler_spark.operators.sampling import global_shuffle

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id int")
    outs = []
    for parts in (1, 16):
        got = {
            r["doc_id"]: (r["shuffle_rank"], r["shard"])
            for r in global_shuffle(
                df.repartition(parts), "doc_id", shard_size=50
            ).collect()
        }
        outs.append(got)
    assert outs[0] == outs[1]
    # matches the pure-Python md5 order
    want_order = sorted(
        range(500), key=lambda i: (hashlib.md5(f"42:{i}".encode()).hexdigest(), i)
    )
    want = {i: (r, r // 50) for r, i in enumerate(want_order)}
    assert outs[0] == want
    # genuinely shuffled: the identity order is broken early and often
    first_20 = [i for i, _ in sorted(outs[0].items(), key=lambda kv: kv[1][0])][:20]
    assert first_20 != list(range(20))
