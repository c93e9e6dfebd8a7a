"""Set-containment join (operators/search.py)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mizzounewscrawler_spark.operators.search import containment_join  # noqa: E402


def _brute(docs, queries):
    out = set()
    for qid, qt in queries:
        for did, dt in docs:
            if set(qt) <= set(dt):
                out.add((qid, did))
    return out


DOCS = [
    (1, ["the", "quick", "brown", "fox"]),
    (2, ["the", "lazy", "dog"]),
    (3, ["quick", "quick", "dog", "the"]),
    (4, []),
]
QUERIES = [
    (10, ["the", "quick"]),     # docs 1, 3
    (11, ["dog"]),              # docs 2, 3
    (12, ["unicorn"]),          # corpus-absent token: no matches
    (13, ["the", "unicorn"]),   # mixed present/absent: no matches
    (14, []),                   # vacuous: every doc
]


def test_containment_join_matches_brute_force(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, tokens array<string>")
    q = spark.createDataFrame(QUERIES, "q_id long, q_tokens array<string>")
    got = {
        (r["q_id"], r["doc_id"])
        for r in containment_join(d, q).collect()
    }
    assert got == _brute(DOCS, QUERIES)
    assert (14, 4) in got  # empty ⊆ empty


def test_containment_join_rarest_token_plan_no_cartesian(spark):
    """Non-empty queries must produce an equi-join plan (the rarest-token
    prefix filter), never a cartesian/BNLJ over docs × queries."""
    d = spark.createDataFrame(DOCS[:3], "doc_id long, tokens array<string>")
    q = spark.createDataFrame(
        QUERIES[:2], "q_id long, q_tokens array<string>"
    )
    plan = containment_join(d, q)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_containment_join_duplicate_tokens_dedup(spark):
    """Duplicate tokens in either side don't multiply output pairs."""
    d = spark.createDataFrame(
        [(1, ["a", "a", "b"])], "doc_id long, tokens array<string>"
    )
    q = spark.createDataFrame(
        [(9, ["a", "a"])], "q_id long, q_tokens array<string>"
    )
    rows = containment_join(d, q).collect()
    assert [(r["q_id"], r["doc_id"]) for r in rows] == [(9, 1)]
