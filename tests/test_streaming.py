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
