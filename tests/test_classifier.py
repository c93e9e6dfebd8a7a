"""Trained linear quality classifier (operators/classifier.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mizzounewscrawler_spark.operators.classifier import (
    classifier_score,
    classifier_weights,
    quality_gate,
)


def test_weights_hand_computed(spark):
    """3-doc train set; verify the cross-multiplied rate differences."""
    train = spark.createDataFrame(
        [("good Good prose", True), ("spam spam prose", False)],
        "text string, pos boolean",
    )
    w = {r["token"]: r["weight"]
         for r in classifier_weights(train, F.col("pos")).collect()}
    # N_pos = 3 (good, good, prose), N_neg = 3 (spam, spam, prose)
    # good: c_pos=2, c_neg=0 -> 2*3 - 0*3 = 6
    # spam: c_pos=0, c_neg=2 -> -6 ; prose: 1*3 - 1*3 = 0
    assert w == {"good": 6, "spam": -6, "prose": 0}


def test_score_and_gate(spark):
    train = spark.createDataFrame(
        [("alpha beta", True), ("junk junk", False)],
        "text string, pos boolean",
    )
    w = classifier_weights(train, F.col("pos"))
    # weights (N_pos=N_neg=2): alpha=+2, beta=+2, junk=0*2-2*2=-4
    docs = spark.createDataFrame(
        [
            (1, "alpha alpha beta"),   # 2+2+2 = +6
            (2, "junk beta junk"),     # -4+2-4 = -6
            (3, "unseen words only"),  # 0 -> not kept at threshold 0
            (4, ""),                   # empty -> dropped
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r
           for r in quality_gate(classifier_score(docs, w)).collect()}
    assert out[1]["score"] == 6 and out[1]["keep"]
    assert out[2]["score"] == -6 and not out[2]["keep"]
    assert out[3]["score"] == 0 and not out[3]["keep"]
    assert out[3]["n_tokens"] == 3
    assert 4 not in out


def test_partitioning_invariance(spark):
    """Integer arithmetic: identical weights and scores from a 1-partition
    and a 32-partition layout of the same train/score inputs."""
    rows = [
        (i, f"tok{i % 7} tok{i % 3} filler{i % 11} common", i % 2 == 0)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, pos boolean")
    outs = []
    for parts in (1, 32):
        d = df.repartition(parts)
        w = classifier_weights(d, F.col("pos"))
        outs.append(
            {r["doc_id"]: (r["n_tokens"], r["score"])
             for r in classifier_score(d, w).collect()}
        )
    assert outs[0] == outs[1]
    assert len(outs[0]) == 200


def test_class_token_bound_raises(spark, monkeypatch):
    import mizzounewscrawler_spark.operators.classifier as c

    monkeypatch.setattr(c, "MAX_CLASS_TOKENS", 3)
    train = spark.createDataFrame(
        [("a b c d", True), ("x", False)], "text string, pos boolean"
    )
    with pytest.raises(ValueError, match="subsample"):
        c.classifier_weights(train, F.col("pos"))


def test_single_class_raises(spark):
    train = spark.createDataFrame(
        [("a b", True), ("c", True)], "text string, pos boolean"
    )
    with pytest.raises(ValueError, match="both classes"):
        classifier_weights(train, F.col("pos"))


def test_catalog_oracle_parity(spark):
    """quality_classifier catalog entry matches its DuckDB mirror on the
    sf0.001 documents table (value-exact — integer scores)."""
    import duckdb

    from mizzounewscrawler_spark.plans.relational import (
        SQL_QUALITY_CLASSIFIER,
        q_quality_classifier,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: (r["n_tokens"], r["score"], r["keep"])
        for r in q_quality_classifier(spark, sf).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(SQL_QUALITY_CLASSIFIER).fetchall()
    }
    assert got == want
    # the gate must separate: some kept, some dropped
    keeps = [v[2] for v in got.values()]
    assert any(keeps) and not all(keeps)
