"""The full downstream pipeline: crawl articles → clean → classify →
entities → county report.

Restates the reference's continuous processor
(/root/reference/orchestration/continuous_processor.py:589-699 — a poll
loop shelling out to per-stage CLI subprocesses) as one composed lazy plan:
each stage is a DataFrame transformation, Catalyst sees the whole chain,
and nothing materializes until the caller writes/collects.  Stage gating
(the reference's status-count polling) is subsumed by column predicates —
each stage consumes exactly the statuses the reference's gating queries
would have selected (orchestration/continuous_processor.py:102-177).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mizzounewscrawler_spark.operators.cleaner import clean_articles
from mizzounewscrawler_spark.operators.ml import (
    classify_articles,
    extract_entities,
    geocode_lookup,
    match_gazetteer,
)
from mizzounewscrawler_spark.plans.report import county_report


def run_pipeline(
    spark: SparkSession,
    articles: DataFrame,
    sources: DataFrame,
    gazetteer: DataFrame | None = None,
    geocode_cache: DataFrame | None = None,
    county: str | None = None,
) -> dict[str, DataFrame]:
    """Chain every post-crawl stage; returns the intermediate tables.

    ``articles``: the crawl engine's articles table (url_hash keyed).
    ``sources``: (host, name, city, county).
    Returns {cleaned, labels, entities, report}; entities gain gazetteer /
    geocode columns when those dims are provided.
    """
    cleaned = clean_articles(articles)
    ready = cleaned.where(F.col("status") == "cleaned")
    # classifier/NER run on CLEANED text (reference: ML stage consumes
    # status='cleaned' rows, continuous_processor.py:141-152)
    ready = ready.withColumn("_ml_text", F.coalesce("text_clean", "text"))
    labels = classify_articles(ready, text_col="_ml_text")
    entities = extract_entities(ready, text_col="_ml_text")
    if gazetteer is not None:
        entities = match_gazetteer(entities, gazetteer)
    if geocode_cache is not None:
        entities = geocode_lookup(entities, geocode_cache)
    report = county_report(
        cleaned,
        sources,
        labels=labels.withColumnRenamed("primary_confidence", "confidence"),
        entities=entities,
        county=county,
    )
    return {
        "cleaned": cleaned,
        "labels": labels,
        "entities": entities,
        "report": report,
    }
