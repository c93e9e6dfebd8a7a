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


def stream_host_politeness_state(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = "host string, ts timestamp, ok boolean",
):
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-host politeness state over a stream of fetch results.

    The streaming twin of :func:`operators.scheduler.update_host_state`
    (SURVEY.md P3/P7): state per host = (consecutive_failures,
    backoff_until, fetched_total); each micro-batch folds its group's rows
    into the state with the same semantics — failures reset on success,
    ≥3 consecutive failures → 30-min pause, else exponential backoff
    60·2^(n−1)s capped 1 h — and emits the updated row.  State lives in the
    streaming state store (RocksDB/HDFS-backed on a cluster), checkpointed
    per batch.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from mizzounewscrawler_spark.operators.scheduler import (
        BACKOFF_BASE_S,
        BACKOFF_CAP_S,
        FAILURE_PAUSE_AFTER,
        FAILURE_PAUSE_S,
    )

    out_schema = (
        "host string, consecutive_failures int, backoff_until double, "
        "fetched_total long"
    )
    state_schema = "consecutive_failures int, backoff_until double, fetched_total long"

    def update(key, pdfs, state: GroupState):
        (host,) = key
        if state.exists:
            consec, backoff, fetched = state.get
        else:
            consec, backoff, fetched = 0, None, 0
        last_ts = 0.0
        for pdf in pdfs:
            # deterministic fold order within the batch
            pdf = pdf.sort_values("ts")
            for ok, ts in zip(pdf["ok"], pdf["ts"]):
                last_ts = ts.timestamp()
                if bool(ok):
                    consec, backoff, fetched = 0, None, fetched + 1
                else:
                    consec += 1
                    if consec >= FAILURE_PAUSE_AFTER:
                        backoff = last_ts + FAILURE_PAUSE_S
                    else:
                        backoff = last_ts + min(
                            BACKOFF_BASE_S * 2 ** (consec - 1), BACKOFF_CAP_S
                        )
        state.update((int(consec), backoff, int(fetched)))
        yield pd.DataFrame(
            {
                "host": [host],
                "consecutive_failures": [int(consec)],
                "backoff_until": [backoff],
                "fetched_total": [int(fetched)],
            }
        )

    raw = spark.readStream.schema(schema).parquet(in_dir)
    updated = raw.groupBy("host").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # file sinks are append-only; update-mode state emissions go through
    # foreachBatch.  Each batch lands in its own batch_id-keyed directory
    # with overwrite, so a micro-batch retried after a crash between the
    # write and the checkpoint commit replaces its partial output instead
    # of duplicating it (exactly-once per batch_id).
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return (
        updated.writeStream.foreachBatch(sink)
        .outputMode("update")
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
    the wave loop's checkpoint contract.

    Exactly-once: foreachBatch alone is at-least-once (a micro-batch retried
    after a crash between the table write and the stream checkpoint commit
    re-runs), so the sink is idempotent per batch_id — if the table's latest
    snapshot already committed this batch_id (or a later one), the append is
    skipped instead of double-landing the batch (VERDICT r2 #6)."""
    from mizzounewscrawler_spark.lake import LakeTable

    table = LakeTable(spark, table_path)
    raw = spark.readStream.schema(schema).parquet(in_dir)
    if transform is not None:
        raw = transform(raw)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        snap = table.current_snapshot()
        last = snap.summary.get("batch_id", -1) if snap is not None else -1
        if isinstance(last, int) and last >= batch_id:
            return  # retried micro-batch: already committed
        table.append(batch_df, {"batch_id": batch_id, "streaming": True})

    return (
        raw.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_neardup_maintenance(
    spark: SparkSession,
    in_dir: str,
    postings_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    schema: str = "id string, text string",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    max_files_per_trigger: int | None = None,
):
    """Streaming twin of the crawl's ``neardup_minhash`` maintenance
    (crawl.py run_crawl): each micro-batch of documents is MinHash-banded,
    self-paired for intra-batch near-dups, probed against the accumulated
    ``neardup_postings`` index for pairs vs ALL prior batches (prior text
    is never rescanned — only its ~64 B/doc postings), and appended.
    Across a whole stream the pair union equals a one-shot
    ``minhash_lsh_pairs`` over every document seen (invariant pinned in
    tests/test_streaming.py).

    At-least-once → exactly-once the same way as
    :func:`stream_into_laketable`: each table append is skipped when its
    latest snapshot already carries this ``batch_id``.  Pairs commit
    BEFORE postings (matching the wave loop), so a crash between the two
    appends replays into "skip pairs, append postings" — the probe on the
    retried batch still sees the index as-of the previous batch because
    its own postings were never appended.
    """
    from mizzounewscrawler_spark.lake import LakeTable
    from mizzounewscrawler_spark.operators.dedup import (
        band_self_pairs,
        minhash_band_postings,
        probe_band_index,
    )

    postings_t = LakeTable(spark, postings_path)
    pairs_t = LakeTable(spark, pairs_path)
    raw = spark.readStream.schema(schema)
    if max_files_per_trigger:
        raw = raw.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = raw.parquet(in_dir)

    def _last(table: "LakeTable") -> int:
        snap = table.current_snapshot()
        v = snap.summary.get("batch_id", -1) if snap is not None else -1
        return v if isinstance(v, int) else -1

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.where(
            F.col("text").isNotNull() & (F.length("text") > 0)
        ).select("id", "text")
        postings = minhash_band_postings(
            docs, "id", "text",
            num_hashes=num_hashes, bands=bands, shingle_k=shingle_k,
        ).cache()
        try:
            pairs = band_self_pairs(postings)
            if postings_t.exists():
                pairs = pairs.unionByName(
                    probe_band_index(postings, postings_t.read()).select(
                        F.col("new_id").alias("id_a"),
                        F.col("corpus_id").alias("id_b"),
                    )
                )
            if _last(pairs_t) < batch_id:
                pairs_t.append(
                    pairs.withColumn("batch_id", F.lit(batch_id)),
                    {"batch_id": batch_id, "streaming": True},
                )
            if _last(postings_t) < batch_id:
                postings_t.append(
                    postings, {"batch_id": batch_id, "streaming": True}
                )
        finally:
            postings.unpersist()

    return (
        raw.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_hll_distinct(
    spark: SparkSession,
    in_dir: str,
    registers_path: str,
    checkpoint_dir: str,
    key_col: str = "url",
    schema: str = "url string",
    p: int = 12,
):
    """Streaming twin of :func:`operators.sketches.approx_distinct`:
    maintain the distinct-count register table over an unbounded key
    stream.  Each micro-batch is sketched (``hll_registers``) and merged
    into the persisted register parquet by max() — after any prefix of
    the stream the table equals the one-shot sketch of every key seen
    (invariant pinned in tests), and ``hll_estimate`` reads it at any
    time for a live distinct-URL count.

    Replay-safe WITHOUT batch-id bookkeeping: register merge is
    idempotent (max of a max), so an at-least-once re-delivery of a
    micro-batch re-commits an identical snapshot — the one streaming sink
    here that needs no batch-id guard.  The registers live in a LakeTable
    (NOT a plain ``mode("overwrite")`` parquet dir): a plain overwrite is
    delete-then-write, so a crash mid-rewrite would leave the path absent
    or partial and the next batch would silently restart the sketch from
    scratch; the LakeTable's manifest rename is atomic, so a reader — and
    the replayed batch itself — always merges against the last COMMITTED
    registers.  The table is O(2^p) rows by construction (sketch-sized),
    so the merge collects it driver-side and rewrites — never a
    distributed overwrite racing its own scan."""
    from mizzounewscrawler_spark.lake import LakeTable
    from mizzounewscrawler_spark.operators.sketches import (
        hll_merge,
        hll_registers,
    )

    table = LakeTable(spark, registers_path)
    raw = spark.readStream.schema(schema).parquet(in_dir)

    def _merge(batch_df, batch_id: int) -> None:
        import glob as _glob

        sess = batch_df.sparkSession
        new = hll_registers(batch_df, key_col, p)
        if table.exists():
            merged = hll_merge(table.read(), new)
        elif _glob.glob(f"{registers_path}/*.parquet"):
            # migrate a registers dir written by the pre-LakeTable plain
            # parquet sink: fold the legacy registers in once — silently
            # restarting the sketch would collapse the distinct count
            merged = hll_merge(sess.read.parquet(registers_path), new)
        else:
            merged = new
        rows = [(int(r["bucket"]), int(r["rho"])) for r in merged.collect()]
        table.overwrite(
            sess.createDataFrame(rows, "bucket long, rho int").coalesce(1),
            {"batch_id": batch_id, "streaming": True},
        )
        # the registers view only ever needs the newest snapshot; without
        # GC a per-minute stream would accumulate unbounded manifests
        table.expire_snapshots(2)

    return (
        raw.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_cms_maintenance(
    spark: SparkSession,
    in_dir: str,
    table_path: str,
    checkpoint_dir: str,
    key_col: str = "url",
    schema: str = "url string",
    d: int = 4,
    w: int = 1024,
):
    """Streaming maintenance of a count-min grid over an unbounded key
    stream — the replay-semantics COUNTERPOINT to
    :func:`stream_hll_distinct`: CMS merges by cell-wise SUM, which is
    NOT idempotent, so a re-delivered micro-batch would double-count.
    The grid therefore lives in a LakeTable and each merge commits with
    the ``batch_id`` guard (same contract as :func:`stream_into_laketable`):
    a retried batch sees its id already in the latest snapshot summary
    and skips.  After any stream prefix the table equals the one-shot
    ``cms_sketch`` of every key seen (pinned in tests).  The grid is
    O(d·w) rows, so the merge collects driver-side and overwrites — a
    snapshot per micro-batch, with time travel back through the sketch's
    history for free."""
    from mizzounewscrawler_spark.lake import LakeTable
    from mizzounewscrawler_spark.operators.sketches import (
        cms_merge,
        cms_sketch,
    )

    table = LakeTable(spark, table_path)
    raw = spark.readStream.schema(schema).parquet(in_dir)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        snap = table.current_snapshot()
        last = snap.summary.get("batch_id", -1) if snap is not None else -1
        if isinstance(last, int) and last >= batch_id:
            return  # retried micro-batch: sum-merge must not re-apply
        sess = batch_df.sparkSession
        new = cms_sketch(batch_df, key_col, d, w)
        merged = cms_merge(table.read(), new) if snap is not None else new
        rows = [
            (int(r["row"]), int(r["col"]), int(r["cnt"]))
            for r in merged.collect()
        ]
        table.overwrite(
            sess.createDataFrame(rows, "row int, col long, cnt long"),
            {"batch_id": batch_id, "streaming": True},
        )

    return (
        raw.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
