"""ML stage (U5/U6/J6/J7): classifier + NER stubs produce article_labels /
article_entities from ENGINE outputs, gazetteer fuzzy match + geocode cache
joins work, and county_report runs end-to-end on engine-produced inputs
(VERDICT r1 missing #4 — previously the report inputs were test-synthesized)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from mizzounewscrawler_spark.crawl import CrawlConfig, open_tables, run_crawl
from mizzounewscrawler_spark.operators.ml import (
    LABELS,
    classify_articles,
    extract_entities,
    geocode_lookup,
    match_gazetteer,
)
from mizzounewscrawler_spark.plans.report import county_report


@pytest.fixture(scope="module")
def engine_articles(spark, web_spark):
    pages, seeds, robots = web_spark
    out_dir = tempfile.mkdtemp(prefix="ml_crawl_")
    run_crawl(
        spark, pages, seeds, robots, out_dir,
        CrawlConfig(max_waves=4, with_order_log=False),
    )
    arts = open_tables(spark, out_dir).articles.read().cache()
    arts.count()
    yield arts
    arts.unpersist()
    shutil.rmtree(out_dir, ignore_errors=True)


def test_classifier_shape_and_determinism(spark, engine_articles):
    ex = engine_articles.where(F.col("status") == "extracted")
    labels = classify_articles(ex).cache()
    n = labels.count()
    assert n == ex.count()  # one label row per article
    rows = labels.collect()
    for r in rows[:50]:
        assert r["primary_label"] in LABELS
        assert r["alternate_label"] in LABELS
        assert r["primary_label"] != r["alternate_label"]
        assert 0.0 <= r["alternate_confidence"] <= r["primary_confidence"] <= 1.0
    # deterministic across runs
    again = {(r["article_id"], r["primary_label"]) for r in classify_articles(ex).collect()}
    assert {(r["article_id"], r["primary_label"]) for r in rows} == again
    labels.unpersist()


def test_ner_entities_from_engine_text(spark, engine_articles):
    ex = engine_articles.where(F.col("status") == "extracted")
    ents = extract_entities(ex).cache()
    assert ents.count() > 0
    r = ents.first()
    assert r["entity_norm"] == r["entity_text"].lower()
    assert r["entity_label"] in ("GPE", "ORG", "PERSON", "MISC")
    ents.unpersist()


def test_gazetteer_match_and_geocode(spark):
    ents = spark.createDataFrame(
        [
            (1, "Boone County", "boone county", "GPE"),
            (1, "Boon County", "boon county", "GPE"),     # fuzzy hit
            (2, "Columbia", "columbia", "GPE"),
            (3, "Zzz Qqq", "zzz qqq", "PERSON"),          # no match
        ],
        "article_id long, entity_text string, entity_norm string, entity_label string",
    )
    gaz = spark.createDataFrame(
        [
            (101, "boone county", "admin_boundary"),
            (102, "columbia", "city"),
            (103, "boone village", "hamlet"),
        ],
        "gazetteer_id long, name_norm string, osm_category string",
    )
    m = match_gazetteer(ents, gaz, min_score=0.6)
    got = {(r["entity_norm"], r["matched_gazetteer_id"]) for r in m.collect()}
    assert ("boone county", 101) in got
    assert ("boon county", 101) in got  # best fuzzy candidate wins
    assert ("columbia", 102) in got
    assert not any(n == "zzz qqq" for n, _ in got)

    cache = spark.createDataFrame(
        [("columbia", 38.95, -92.33, "Columbia, MO")],
        "normalized_input string, lat double, lon double, place string",
    )
    geo = geocode_lookup(ents, cache).collect()
    by_norm = {r["entity_norm"]: r for r in geo}
    assert by_norm["columbia"]["lat"] == pytest.approx(38.95)
    assert by_norm["boone county"]["lat"] is None  # cache miss -> null


def test_county_report_on_engine_outputs(spark, engine_articles, web_spark):
    """J4/A3/J5 over engine-produced labels+entities (not synthesized)."""
    _, seeds, _ = web_spark
    ex = engine_articles.where(F.col("status") == "extracted")
    labels = classify_articles(ex).withColumnRenamed(
        "primary_confidence", "confidence"
    )
    ents = extract_entities(ex)
    src = seeds.select(
        "host", "name",
        F.lit("Columbia").alias("city"), F.lit("Boone").alias("county"),
    )
    rep = county_report(engine_articles, src, labels=labels, entities=ents)
    rows = rep.collect()
    assert rows
    labeled = [r for r in rows if r["primary_label"] is not None]
    assert labeled, "no engine-produced labels joined into the report"
    with_ents = [r for r in rows if r["entities"]]
    assert with_ents, "no engine-produced entities joined into the report"


def test_full_pipeline_chain(spark, engine_articles, web_spark):
    """continuous-processor analog: crawl articles -> clean -> classify ->
    entities -> report as ONE composed plan (plans/pipeline.py)."""
    from mizzounewscrawler_spark.plans.pipeline import run_pipeline

    _, seeds, _ = web_spark
    src = seeds.select(
        "host", "name",
        F.lit("Columbia").alias("city"), F.lit("Boone").alias("county"),
    )
    gaz = spark.createDataFrame(
        [(1, "rock bridge", "park"), (2, "mary smith", "person")],
        "gazetteer_id long, name_norm string, osm_category string",
    )
    out = run_pipeline(spark, engine_articles, src, gazetteer=gaz)
    assert set(out) == {"cleaned", "labels", "entities", "report"}
    rep = out["report"].collect()
    assert rep, "pipeline report is empty"
    statuses = {r["status"] for r in rep}
    assert statuses <= {"cleaned", "extracted", "feed", "failed"}
    assert "cleaned" in statuses
    # labels flowed through into the report
    assert any(r["primary_label"] is not None for r in rep)
