"""Structured-Streaming surface: watermarked dedup, windowed rollup,
foreachBatch → LakeTable snapshot commits."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pytest

from mizzounewscrawler_spark.lake import LakeTable
from mizzounewscrawler_spark.streaming.waves import (
    stream_discoveries,
    stream_hourly_rollup,
    stream_into_laketable,
)


@pytest.fixture()
def tmpdirs():
    d = tempfile.mkdtemp(prefix="stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_discoveries_dedup(spark, tmpdirs):
    base = dt.datetime(2024, 1, 15, 12, 0, 0)
    rows = [
        ("https://www.a.test/story?utm_source=x", base),
        ("https://a.test/story", base),  # same canonical URL → deduped
        ("https://b.test/other", base),
        ("not a url", base),
    ]
    in_dir = f"{tmpdirs}/in"
    spark.createDataFrame(rows, "url string, discovered_at timestamp").write.parquet(in_dir)
    q = stream_discoveries(spark, in_dir, f"{tmpdirs}/out", f"{tmpdirs}/ckpt")
    q.awaitTermination(120)
    out = spark.read.parquet(f"{tmpdirs}/out")
    surts = sorted(r["url_surt"] for r in out.collect())
    assert surts == ["test,a)/story", "test,b)/other"]


def test_stream_hourly_rollup(spark, tmpdirs):
    base = dt.datetime(2024, 1, 15, 10, 0, 0)
    rows = [
        (1, base + dt.timedelta(minutes=5), 1, "click", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=50), 1, "click", 2.0, "{}"),
        (3, base + dt.timedelta(minutes=70), 2, "view", 5.0, "{}"),
    ]
    in_dir = f"{tmpdirs}/in"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(in_dir)
    q = stream_hourly_rollup(
        spark, in_dir, f"{tmpdirs}/out", f"{tmpdirs}/ckpt", watermark="0 seconds"
    )
    q.awaitTermination(120)
    out = {(r["hour"], r["event_type"]): (r["n"], r["total_value"])
           for r in spark.read.parquet(f"{tmpdirs}/out").collect()}
    # append mode: the 10:00 window closed (watermark = max ts = 11:10),
    # the 11:00 window is still open and therefore withheld
    assert out[(base, "click")] == (2, 3.0)
    assert (base + dt.timedelta(hours=1), "view") not in out


def test_stream_into_laketable_snapshots(spark, tmpdirs):
    in_dir = f"{tmpdirs}/in"
    spark.range(10).selectExpr("id", "id * 2 AS v").write.parquet(in_dir)
    q = stream_into_laketable(
        spark, in_dir, f"{tmpdirs}/table", f"{tmpdirs}/ckpt", "id long, v long"
    )
    q.awaitTermination(120)
    t = LakeTable(spark, f"{tmpdirs}/table")
    assert t.read().count() == 10
    snaps = t.snapshots()
    assert snaps and snaps[-1].summary.get("streaming") is True
    assert "batch_id" in snaps[-1].summary


def test_stream_into_laketable_exactly_once_on_retry(spark, tmpdirs):
    """A re-delivered micro-batch (crash between table commit and stream
    checkpoint → foreachBatch re-runs with the same batch_id) must not
    double-append: the sink skips batch_ids the table already committed."""
    in_dir = f"{tmpdirs}/in"
    spark.range(10).selectExpr("id", "id * 2 AS v").write.parquet(in_dir)
    q = stream_into_laketable(
        spark, in_dir, f"{tmpdirs}/table", f"{tmpdirs}/ckpt", "id long, v long"
    )
    q.awaitTermination(120)
    t = LakeTable(spark, f"{tmpdirs}/table")
    assert t.read().count() == 10
    v_before = t.current_snapshot().version
    # simulate the retry: a FRESH checkpoint re-delivers batch 0 over the
    # same input to the same table
    q2 = stream_into_laketable(
        spark, in_dir, f"{tmpdirs}/table", f"{tmpdirs}/ckpt2", "id long, v long"
    )
    q2.awaitTermination(120)
    assert t.read().count() == 10  # unchanged — no double-append
    assert t.current_snapshot().version == v_before  # no new snapshot either


def test_stream_host_politeness_state(spark, tmpdirs):
    """applyInPandasWithState: per-host failure/backoff state over two
    micro-batch runs — state persists across restarts via the checkpoint."""
    import datetime as dt

    from mizzounewscrawler_spark.streaming.waves import (
        stream_host_politeness_state,
    )

    base = dt.datetime(2024, 1, 15, 12, 0, 0)
    in_dir, out_dir, ckpt = f"{tmpdirs}/sin", f"{tmpdirs}/sout", f"{tmpdirs}/sckpt"
    batch1 = [
        ("ok.test", base, True),
        ("ok.test", base + dt.timedelta(seconds=1), True),
        ("flaky.test", base, False),
        ("flaky.test", base + dt.timedelta(seconds=1), False),
    ]
    spark.createDataFrame(
        batch1, "host string, ts timestamp, ok boolean"
    ).write.parquet(in_dir)
    q = stream_host_politeness_state(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    out = {r["host"]: r for r in spark.read.parquet(out_dir).collect()}
    assert out["ok.test"]["consecutive_failures"] == 0
    assert out["ok.test"]["fetched_total"] == 2
    assert out["ok.test"]["backoff_until"] is None
    # 2 consecutive failures → exponential backoff 60·2^(2−1) = 120 s
    assert out["flaky.test"]["consecutive_failures"] == 2
    f_ts = (base + dt.timedelta(seconds=1)).timestamp()
    assert abs(out["flaky.test"]["backoff_until"] - (f_ts + 120.0)) < 1e-6

    # second micro-batch: third failure crosses the pause threshold (state
    # carried across a fresh query start from the same checkpoint)
    batch2 = [("flaky.test", base + dt.timedelta(seconds=2), False)]
    spark.createDataFrame(
        batch2, "host string, ts timestamp, ok boolean"
    ).write.mode("append").parquet(in_dir)
    q2 = stream_host_politeness_state(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    rows = [
        r for r in spark.read.parquet(out_dir).collect()
        if r["host"] == "flaky.test" and r["consecutive_failures"] == 3
    ]
    assert rows, "third failure must emit an updated state row"
    f2_ts = (base + dt.timedelta(seconds=2)).timestamp()
    assert abs(rows[0]["backoff_until"] - (f2_ts + 1800.0)) < 1e-6


def test_stream_neardup_maintenance_equals_batch_self_join(spark, tmpdirs):
    """Per-batch incremental maintenance (intra-batch self-pairs + index
    probe) over a multi-file stream must reconstruct EXACTLY the pairs a
    one-shot minhash_lsh_pairs finds over all documents."""
    import pyspark.sql.functions as F

    from mizzounewscrawler_spark.operators.dedup import minhash_lsh_pairs
    from mizzounewscrawler_spark.streaming.waves import (
        stream_neardup_maintenance,
    )

    body_a = "the quick brown fox jumps over the lazy dog " * 8
    body_b = "a completely different document about spark streaming " * 8
    docs = [
        ("d0", body_a),
        ("d1", body_a + "extra tail words here"),   # near-dup of d0
        ("d2", body_b),
        ("d3", body_b),                              # exact dup of d2
        ("d4", "short unrelated text with nothing shared at all " * 6),
        ("d5", body_a),                              # dup of d0, later file
    ]
    in_dir = f"{tmpdirs}/docs"
    # three drops → with maxFilesPerTrigger=1 each becomes its own
    # micro-batch, so cross-batch pairs MUST come from the index probe
    for i in range(3):
        spark.createDataFrame(
            docs[2 * i : 2 * i + 2], "id string, text string"
        ).coalesce(1).write.mode("append").parquet(in_dir)
    q = stream_neardup_maintenance(
        spark, in_dir,
        f"{tmpdirs}/postings", f"{tmpdirs}/pairs", f"{tmpdirs}/ckpt",
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    pairs_t = LakeTable(spark, f"{tmpdirs}/pairs")
    got = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in pairs_t.read().collect()
    }
    all_docs = spark.createDataFrame(docs, "id string, text string")
    want = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in minhash_lsh_pairs(all_docs, "id", "text").collect()
    }
    assert got == want
    assert ("d0", "d5") in got  # cross-batch pair → the index probe fired
    assert len(want) >= 3
    # postings cover every non-empty doc exactly once, 8 bands each
    idx = LakeTable(spark, f"{tmpdirs}/postings").read()
    assert idx.select("id").distinct().count() == len(docs)
    assert idx.count() == len(docs) * 8
    # ≥2 micro-batches actually ran (batch ids recorded per append)
    n_batches = pairs_t.read().select("batch_id").distinct().count()
    assert n_batches >= 2


def test_stream_hll_distinct_equals_batch_sketch_and_replay_safe(
    spark, tmpdirs
):
    """After draining a multi-file stream, the persisted registers equal
    the one-shot batch sketch of every key; a replay of the same data
    with a FRESH checkpoint leaves them unchanged (max-merge idempotence
    — the at-least-once story needs no batch-id guard)."""
    from mizzounewscrawler_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )
    from mizzounewscrawler_spark.streaming.waves import stream_hll_distinct

    in_dir = f"{tmpdirs}/in"
    a = spark.createDataFrame(
        [(f"https://h{i % 7}.test/p{i}",) for i in range(400)], "url string"
    )
    b = spark.createDataFrame(
        [(f"https://h{i % 7}.test/p{i}",) for i in range(200, 600)],
        "url string",
    )
    a.write.mode("append").parquet(in_dir)
    b.write.mode("append").parquet(in_dir)

    reg_path = f"{tmpdirs}/registers"
    q = stream_hll_distinct(spark, in_dir, reg_path, f"{tmpdirs}/ckpt")
    q.awaitTermination(120)

    from mizzounewscrawler_spark.lake import LakeTable

    reg_t = LakeTable(spark, reg_path)
    got = {
        (r["bucket"], r["rho"]) for r in reg_t.read().collect()
    }
    want = {
        (r["bucket"], r["rho"])
        for r in hll_registers(a.unionByName(b), "url").collect()
    }
    assert got == want

    # live estimate within HLL error of the true 600 distinct urls
    est = hll_estimate(reg_t.read()).collect()[0]
    assert abs(est["est_distinct"] - 600) / 600 < 0.05

    # replay everything through a fresh checkpoint: registers unchanged
    q2 = stream_hll_distinct(spark, in_dir, reg_path, f"{tmpdirs}/ckpt2")
    q2.awaitTermination(120)
    again = {
        (r["bucket"], r["rho"]) for r in reg_t.read().collect()
    }
    assert again == got


def test_stream_cms_maintenance_equals_batch_and_guards_replay(
    spark, tmpdirs
):
    """After draining the stream the CMS LakeTable equals the one-shot
    batch sketch; a manual re-run of an already-committed batch_id is a
    no-op (sum-merge is not idempotent — the batch-id guard carries
    exactly-once)."""
    from mizzounewscrawler_spark.lake import LakeTable
    from mizzounewscrawler_spark.operators.sketches import cms_sketch
    from mizzounewscrawler_spark.streaming.waves import stream_cms_maintenance

    in_dir = f"{tmpdirs}/in"
    a = spark.createDataFrame(
        [(f"https://h{i % 11}.test/p{i % 40}",) for i in range(300)],
        "url string",
    )
    b = spark.createDataFrame(
        [(f"https://h{i % 5}.test/p{i % 17}",) for i in range(200)],
        "url string",
    )
    a.write.mode("append").parquet(in_dir)
    b.write.mode("append").parquet(in_dir)

    tbl = f"{tmpdirs}/cms_table"
    q = stream_cms_maintenance(spark, in_dir, tbl, f"{tmpdirs}/ckpt")
    q.awaitTermination(120)

    table = LakeTable(spark, tbl)
    got = {(r["row"], r["col"]): r["cnt"] for r in table.read().collect()}
    want = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_sketch(a.unionByName(b), "url").collect()
    }
    assert got == want

    # replay guard: a FRESH checkpoint re-delivers the same data with
    # batch ids restarting at 0 — every batch id is <= the committed one,
    # so the guard must skip them all and the grid must NOT double-count
    last = table.current_snapshot().summary["batch_id"]
    q2 = stream_cms_maintenance(spark, in_dir, tbl, f"{tmpdirs}/ckpt2")
    q2.awaitTermination(120)
    after = {(r["row"], r["col"]): r["cnt"] for r in table.read().collect()}
    assert after == got
    assert table.current_snapshot().summary["batch_id"] == last
