"""Fixed-point PageRank (operators/graph.py) vs a sequential integer twin."""

from __future__ import annotations

import collections

import pyspark.sql.functions as F  # noqa: F401  (fixture parity style)

from mizzounewscrawler_spark.operators.graph import SCALE, pagerank


def _twin(edges, iterations=3, num=85, den=100):
    """Sequential integer PageRank with identical arithmetic."""
    e = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    od = collections.Counter(s for s, _ in e)
    teleport = (SCALE * (den - num)) // den
    r = {v: SCALE for v in nodes}
    for _ in range(iterations):
        s = collections.defaultdict(int)
        for src, dst in e:
            s[dst] += r[src] // od[src]
        r = {v: teleport + (num * s.get(v, 0)) // den for v in nodes}
    return r


def _run(spark, edges, **kw):
    df = spark.createDataFrame(list(edges), "src long, dst long")
    return {r["id"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_pagerank_matches_integer_twin_on_random_graph(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    edges = {(int(a), int(b)) for a, b in rng.integers(0, 60, (400, 2))}
    assert _run(spark, edges) == _twin(edges)


def test_pagerank_sink_and_source_shapes(spark):
    # 1→2→3 chain plus hub 0→{1,2,3}: 3 is a sink (keeps teleport-only
    # outflow), 0 is a pure source (rank decays to teleport).
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3)]
    got = _run(spark, edges)
    want = _twin(edges)
    assert got == want
    assert got[0] == (SCALE * 15) // 100  # pure source → teleport after iter 1
    assert got[3] == max(got.values())  # the chain sink accumulates


def test_pagerank_drops_self_loops_and_dup_edges(spark):
    edges = [(1, 1), (1, 2), (1, 2), (2, 1)]
    assert _run(spark, edges) == _twin(edges)
