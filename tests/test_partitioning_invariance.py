"""Partitioning invariance: the new distributed operators must return
bit-identical results at 1 partition and at 32 — the single-box stand-in
for "same answer on a 1000-executor cluster" (SURVEY §5c; the crawl twin
is tests/test_two_parallelism_determinism.py)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyspark.sql.functions as F  # noqa: F401


def _both_partitionings(df):
    return df.repartition(1), df.repartition(32)


def test_connected_components_partition_invariant(spark):
    from mizzounewscrawler_spark.operators.dedup import connected_components

    rng = np.random.default_rng(3)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 300, (200, 2)) if a != b]
    e = spark.createDataFrame(edges, "src long, dst long")
    nodes = spark.range(300)
    outs = [
        sorted(map(tuple, connected_components(ep, nodes).collect()))
        for ep in _both_partitionings(e)
    ]
    assert outs[0] == outs[1]


def test_pagerank_partition_invariant(spark):
    from mizzounewscrawler_spark.operators.graph import pagerank

    rng = np.random.default_rng(5)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 80, (500, 2))]
    e = spark.createDataFrame(edges, "src long, dst long")
    outs = [
        sorted(map(tuple, pagerank(ep).collect()))
        for ep in _both_partitionings(e)
    ]
    assert outs[0] == outs[1]  # integer arithmetic → bit-exact, not approx


def test_heavy_hitters_partition_invariant(spark):
    from mizzounewscrawler_spark.operators.sketches import heavy_hitters

    rng = np.random.default_rng(9)
    vals = [f"key{r}" for r in np.clip(rng.zipf(1.4, 10000), 1, 300)]
    df = spark.createDataFrame([(v,) for v in vals], "term string")
    outs = [
        [tuple(r) for r in heavy_hitters(dp, "term", k=10).collect()]
        for dp in _both_partitionings(df)
    ]
    assert outs[0] == outs[1]


def test_asof_join_partition_invariant(spark):
    from mizzounewscrawler_spark.operators.temporal import asof_join

    rng = np.random.default_rng(13)
    left = spark.createDataFrame(
        [
            (i, int(k), dt.datetime(2024, 1, 1) + dt.timedelta(hours=int(h)))
            for i, (k, h) in enumerate(rng.integers(0, 40, (800, 2)) * [1, 17])
        ],
        "eid long, k long, t timestamp",
    )
    right = spark.createDataFrame(
        [
            (int(k), dt.datetime(2024, 1, 1) + dt.timedelta(hours=int(h)), float(v))
            for k, h, v in rng.integers(0, 40, (200, 3)) * [1, 31, 7]
        ],
        "k long, rt timestamp, v double",
    ).groupBy("k", "rt").agg(F.max("v").alias("v"))  # unique per (key, time)
    outs = [
        sorted(
            (r["eid"], r["v"])
            for r in asof_join(lp, right, "k", "k", "t", "rt", ["v"]).collect()
        )
        for lp in _both_partitionings(left)
    ]
    assert outs[0] == outs[1]
