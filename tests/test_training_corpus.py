"""build_training_corpus: the crawl→pretraining-corpus composite
(plans/pipeline.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mizzounewscrawler_spark.plans.pipeline import build_training_corpus


def _articles(spark):
    good = (
        "the quick brown fox jumps over the lazy dog and keeps on running "
        "through the quiet town while neighbors watch from their porches "
        "and talk about the morning news with considerable interest today"
    )
    rows = [
        ("h1", good, None),
        ("h2", good, None),                       # exact dup of h1
        ("h3", good.replace("quick", "swift"), None),
        ("h4", "too short", None),                # fails min_tokens
        ("h5", "", None),                         # empty -> not eligible
        ("h6", None, good + " cleaned variant"),  # text_clean fallback
    ]
    return spark.createDataFrame(
        rows, "url_hash string, text string, text_clean string"
    )


def test_stage_counts_and_exact_dedup(spark):
    out = build_training_corpus(
        _articles(spark), min_tokens=20, min_quality=0.0,
        chunk_size=80, chunk_overlap=10, pack_budget=200,
    )
    s = out["stats"].collect()[0]
    assert s["eligible_docs"] == 5          # h5 dropped (empty)
    assert s["gated_docs"] == 4             # h4 dropped (short)
    assert s["unique_docs"] == 3            # h1/h2 collapse, keep lowest
    kept = {r["url_hash"] for r in out["deduped"].select("url_hash").collect()}
    assert kept == {"h1", "h3", "h6"}
    assert s["chunks"] > 0 and s["sequences"] > 0
    # every chunk of every kept doc lands in exactly one packed sequence
    n_items = out["packed"].agg(F.sum("n_items")).collect()[0][0]
    assert n_items == s["chunks"]
    assert s["total_chars"] == out["chunks"].agg(
        F.sum("n_chars")
    ).collect()[0][0]


def test_classifier_gate_filters(spark):
    from mizzounewscrawler_spark.operators.classifier import (
        classifier_weights,
    )

    arts = _articles(spark)
    # train: the fox prose is "high quality", junk tokens are not
    train = spark.createDataFrame(
        [
            ("the quick brown fox jumps over the lazy dog", True),
            ("zz yy xx ww vv uu tt ss rr qq", False),
        ],
        "text string, pos boolean",
    )
    w = classifier_weights(train, F.col("pos"))
    out = build_training_corpus(
        arts, min_tokens=5, min_quality=0.0, classifier_weights=w
    )
    kept = {r["url_hash"] for r in out["gated"].select("url_hash").collect()}
    assert "h1" in kept
    # a junk-only doc scores <= 0 and is gated out
    junk = spark.createDataFrame(
        [("j1", "zz yy xx ww vv uu tt ss rr qq zz yy", None)],
        "url_hash string, text string, text_clean string",
    )
    out2 = build_training_corpus(
        junk, min_tokens=5, min_quality=0.0, classifier_weights=w
    )
    assert out2["gated"].count() == 0


def test_partitioning_invariance(spark):
    arts = _articles(spark)
    a = build_training_corpus(arts.repartition(1))["packed"]
    b = build_training_corpus(arts.repartition(16))["packed"]
    ka = sorted(tuple(r) for r in a.collect())
    kb = sorted(tuple(r) for r in b.collect())
    assert ka == kb


def test_neardup_stage_drops_fuzzy_duplicates(spark):
    """With neardup=True the MinHash pass removes near-identical docs that
    exact dedup keeps (one word changed); the lowest url_hash survives."""
    body = ("the quick brown fox jumps over the lazy dog and keeps going "
            "through the quiet town while neighbors watch from porches "
            "and talk about the news of the day with interest") * 2
    rows = [
        ("a1", body, None),
        ("a2", body.replace("quiet", "sleepy"), None),  # near-dup of a1
        ("b1", "completely different text " * 20, None),
    ]
    arts = spark.createDataFrame(
        rows, "url_hash string, text string, text_clean string"
    )
    exact_only = build_training_corpus(arts, min_tokens=5, min_quality=0.0)
    kept_exact = {r["url_hash"]
                  for r in exact_only["deduped"].select("url_hash").collect()}
    assert kept_exact == {"a1", "a2", "b1"}  # exact dedup keeps both
    fuzzy = build_training_corpus(
        arts, min_tokens=5, min_quality=0.0, neardup=True
    )
    kept = {r["url_hash"]
            for r in fuzzy["deduped"].select("url_hash").collect()}
    assert kept == {"a1", "b1"}
