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


def build_training_corpus(
    articles: DataFrame,
    min_tokens: int = 20,
    min_quality: float = 0.35,
    chunk_size: int = 400,
    chunk_overlap: int = 40,
    pack_budget: int = 1200,
    classifier_weights: DataFrame | None = None,
    classifier_threshold: int = 0,
    neardup: bool = False,
    neardup_num_hashes: int = 32,
    neardup_bands: int = 8,
    cache_intermediates: bool = False,
) -> dict[str, DataFrame]:
    """Crawl output → training-ready packed sequences, one lazy chain —
    the bridge between the engine's two halves: the crawl/extraction
    parity surface produces ``articles``; this composes the curation
    operators into the corpus a pretraining run would consume.

    Stages (each returned for inspection, all lazy):

    1. ``eligible`` — fetched rows with extractable text
       (``coalesce(text_clean, text)``), the reference's
       status-gating restated as a predicate;
    2. ``gated`` — length + heuristic quality gates (JVM expressions on
       the scan), plus the trained GPT-3-style classifier gate when a
       weight table from ``operators.classifier`` is supplied;
    3. ``deduped`` — exact content dedup, keep lowest url_hash per
       sha256 (one window over the uniform hash key); with
       ``neardup=True`` a MinHash-LSH fuzzy pass follows (banded bucket
       join → connected components → keep-lowest-id), the published
       pipelines' fuzzy-dedup stage on the exact-dedup survivors;
    4. ``chunks`` — overlapping ``chunk_size``-char training windows;
    5. ``packed`` — deterministic next-fit packing into sequences of
       ≤ ``pack_budget`` chars;
    6. ``stats`` — one-row corpus summary (docs kept/dropped per stage,
       chunk and sequence counts) for the run report.

    At 100 TB every stage is scan-shaped or keyed on a uniform hash; the
    only sequential unit is pack_sequences' data-derived bucket.
    """
    from pyspark.sql import Window

    from mizzounewscrawler_spark.functions.text import (
        content_hash_expr,
        quality_score_expr,
        token_count_expr,
    )
    from mizzounewscrawler_spark.operators.chunking import (
        chunk_documents,
        pack_sequences,
    )

    txt = F.coalesce(F.col("text_clean"), F.col("text"))
    eligible = (
        articles.withColumn("_txt", txt)
        .where(F.col("_txt").isNotNull() & (F.trim(F.col("_txt")) != ""))
    )
    gated = eligible.where(
        (token_count_expr(F.col("_txt")) >= min_tokens)
        & (quality_score_expr(F.col("_txt")) >= min_quality)
    )
    if classifier_weights is not None:
        from mizzounewscrawler_spark.operators.classifier import (
            classifier_score,
        )

        scored = classifier_score(
            gated.select("url_hash", "_txt"),
            classifier_weights,
            id_col="url_hash",
            text_col="_txt",
        ).where(F.col("score") > classifier_threshold)
        gated = gated.join(scored.select("url_hash"), "url_hash", "left_semi")
    w = Window.partitionBy("_chash").orderBy(F.col("url_hash").asc())
    deduped = (
        gated.withColumn("_chash", content_hash_expr(F.col("_txt")))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    if neardup:
        from mizzounewscrawler_spark.operators.dedup import (
            minhash_lsh_chain_pairs,
            resolve_neardup_clusters,
        )

        nd_in = deduped.select("url_hash", F.col("_txt").alias("_nd_text"))
        # chain form, not the clique: downstream is connected components,
        # which only needs connectivity — a hot LSH bucket (boilerplate
        # passage shared corpus-wide) emits O(m) chain rows instead of an
        # O(m^2) clique explosion, with byte-identical clusters
        # (dedup.band_chain_pairs; BENCH/llm_ops.py is the measurement)
        pairs = minhash_lsh_chain_pairs(
            nd_in,
            "url_hash",
            "_nd_text",
            num_hashes=neardup_num_hashes,
            bands=neardup_bands,
        )
        verdicts = resolve_neardup_clusters(nd_in, pairs, id_col="url_hash")
        deduped = deduped.join(
            verdicts.where(F.col("is_kept")).select("url_hash"),
            "url_hash",
            "left_semi",
        )
    if cache_intermediates:
        # a caller that materializes several outputs (the corpus CLI verb
        # writes chunks AND packed AND collects stats) would otherwise
        # re-run the gate + dedup (+ MinHash/connected-components) prefix
        # once per action — cache the expensive frontier of the DAG so the
        # fan-out computes it once; the lazy default stays for callers
        # that pick one output
        deduped = deduped.cache()
    chunks = chunk_documents(
        deduped.select("url_hash", F.col("_txt").alias("chunk_text")),
        "chunk_text",
        size=chunk_size,
        overlap=chunk_overlap,
        id_cols=["url_hash"],
    ).withColumn("n_chars", F.length("chunk"))
    if cache_intermediates:
        chunks = chunks.cache()
    packed = pack_sequences(
        chunks.select(
            F.concat_ws("#", "url_hash", "chunk_id").alias("item_id"),
            "n_chars",
        ),
        id_col="item_id",
        weight_col="n_chars",
        budget=pack_budget,
    )
    stats = (
        eligible.agg(F.count(F.lit(1)).alias("eligible_docs"))
        .crossJoin(gated.agg(F.count(F.lit(1)).alias("gated_docs")))
        .crossJoin(deduped.agg(F.count(F.lit(1)).alias("unique_docs")))
        .crossJoin(chunks.agg(F.count(F.lit(1)).alias("chunks")))
        .crossJoin(
            packed.agg(
                # one row per packed sequence; seq_id is per-bucket
                F.count(F.lit(1)).alias("sequences"),
                F.coalesce(F.sum("total_weight"), F.lit(0)).alias(
                    "total_chars"
                ),
            )
        )
    )
    return {
        "eligible": eligible.drop("_txt"),
        "gated": gated.drop("_txt"),
        "deduped": deduped.drop("_txt", "_chash"),
        "chunks": chunks,
        "packed": packed,
        "stats": stats,
    }
