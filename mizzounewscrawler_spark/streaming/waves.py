"""Structured-Streaming surface for the crawl pipeline.

The reference "streams" by polling DB status columns every 60 s
(/root/reference/orchestration/continuous_processor.py:589-699 — SURVEY.md
P13).  The engine's batch wave loop (crawl.py) is the primary restatement;
this module additionally exposes the same dataflow as real Structured
Streaming for deployments that want it:

- :func:`stream_discoveries` — ``readStream`` over a frontier-drop directory
  (file source = the micro-batch analog of the reference's poll loop),
  canonicalize → watermarked ``dropDuplicates`` on url_hash → sink.
- :func:`stream_hourly_rollup` — watermarked tumbling-window counters over
  an events stream (the telemetry A9 rollup as streaming).
- ``foreachBatch`` writers merge each micro-batch into LakeTables, giving
  the same snapshot-per-batch checkpointing as the wave loop.

All demos run with ``trigger(availableNow=True)`` so tests are bounded and
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mizzounewscrawler_spark.functions.urls import surt_expr, url_hash_expr


def stream_discoveries(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = "url string, discovered_at timestamp",
):
    """File-source stream of raw discovered URLs → canonical deduped sink.

    Watermark + dropDuplicates = the streaming-state form of the URL-seen
    dedup: state holds one entry per url_hash inside the watermark horizon;
    the Bloom+anti batch path (dedup.py) remains the cross-run dedup.
    """
    raw = spark.readStream.schema(schema).parquet(in_dir)
    surt = surt_expr(F.col("url"))
    canon = (
        raw.withColumn("url_surt", surt)
        .where(F.col("url_surt").isNotNull())
        .withColumn("url_hash", url_hash_expr(F.col("url_surt")))
        .withWatermark("discovered_at", "1 hour")
        .dropDuplicates(["url_hash"])
    )
    return (
        canon.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_hourly_rollup(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    watermark: str = "2 hours",
):
    """Watermarked tumbling-window aggregation over an events stream
    (late data beyond the watermark dropped — the P12 late-data analog).
    Append mode emits a window only once the watermark passes its end;
    still-open windows are withheld until a later micro-batch closes them."""
    raw = spark.readStream.schema(schema).parquet(in_dir)
    agg = (
        raw.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n",
            F.round("total_value", 2).alias("total_value"),
        )
    )
    return (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_into_laketable(
    spark: SparkSession,
    in_dir: str,
    table_path: str,
    checkpoint_dir: str,
    schema: str,
    transform=None,
):
    """foreachBatch → LakeTable snapshot per micro-batch: every batch commit
    carries (batch_id, rows) in the snapshot summary — the streaming twin of
    the wave loop's checkpoint contract."""
    from mizzounewscrawler_spark.lake import LakeTable

    table = LakeTable(spark, table_path)
    raw = spark.readStream.schema(schema).parquet(in_dir)
    if transform is not None:
        raw = transform(raw)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        table.append(batch_df, {"batch_id": batch_id, "streaming": True})

    return (
        raw.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
