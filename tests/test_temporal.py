"""Backward as-of join (operators/temporal.py) — semantics vs hand oracle."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from mizzounewscrawler_spark.operators.temporal import asof_join


def _ts(day):
    return dt.datetime(2024, 1, day)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(1)), (2, 10, _ts(3)), (3, 10, _ts(5)),
         (4, 20, _ts(4)), (5, 30, _ts(9))],
        "eid long, k long, t timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts(3), 100.0), (10, _ts(4), 200.0), (20, _ts(1), 300.0)],
        "k long, rt timestamp, v double",
    )
    return left, right


def _run(left, right, **kw):
    out = asof_join(
        left, right, left_on="k", right_on="k",
        left_time="t", right_time="rt", payload_cols=["v"], **kw
    )
    return {r["eid"]: r["v"] for r in out.collect()}


def test_asof_backward_inclusive(spark, frames):
    left, right = frames
    got = _run(left, right)
    # eid1: t=1 precedes every right row → null.  eid2: t=3 matches rt=3
    # (inclusive).  eid3: t=5 → latest is rt=4.  eid4: other key.  eid5:
    # key 30 has no right rows at all → null.
    assert got == {1: None, 2: 100.0, 3: 200.0, 4: 300.0, 5: None}


def test_asof_tolerance_nulls_stale_matches(spark, frames):
    left, right = frames
    got = _run(left, right, tolerance_days=1)
    # eid3 gap = 1 day (ok), eid4 gap = 3 days (stale → null).
    assert got == {1: None, 2: 100.0, 3: 200.0, 4: None, 5: None}


def test_asof_emits_matched_right_time(spark, frames):
    left, right = frames
    out = asof_join(
        left, right, "k", "k", "t", "rt", ["v"]
    ).where(F.col("eid") == 3).collect()[0]
    assert out["asof_rt"] == _ts(4)


def test_asof_rejects_payload_collision(spark, frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(left, right.withColumnRenamed("v", "t"), "k", "k", "t", "rt", ["t"])


def test_range_join_containment_and_bucketing(spark):
    from mizzounewscrawler_spark.operators.temporal import range_join

    pts = spark.createDataFrame(
        [(1, 10, dt.datetime(2024, 1, 5, 12)),   # inside A
         (2, 10, dt.datetime(2024, 1, 8, 0)),    # == A end (exclusive) → no
         (3, 10, dt.datetime(2024, 1, 3, 0)),    # == A start (inclusive)
         (4, 20, dt.datetime(2024, 1, 5, 12)),   # wrong key
         (5, 10, dt.datetime(2024, 1, 20, 0))],  # no window
        "pid long, k long, t timestamp",
    )
    iv = spark.createDataFrame(
        [(10, 7, dt.date(2024, 1, 3), dt.date(2024, 1, 8)),   # A: multi-day
         (10, 8, dt.date(2024, 1, 5), dt.date(2024, 1, 6)),   # B: one day
         (30, 9, dt.date(2024, 1, 1), dt.date(2024, 1, 31))],
        "k2 long, wid long, s date, e date",
    )
    got = sorted(
        (r["pid"], r["wid"])
        for r in range_join(pts, iv, "k", "k2", "t", "s", "e").collect()
    )
    assert got == [(1, 7), (1, 8), (3, 7)]


def test_asof_null_payload_does_not_mix_rows(spark):
    """The matched right row travels whole: when the LATEST match has a
    NULL payload column, that NULL must come through — not an older row's
    value spliced in per-column (the independent-forward-fill bug)."""
    left = spark.createDataFrame(
        [(1, 10, _ts(3))], "eid long, k long, t timestamp"
    )
    right = spark.createDataFrame(
        [(10, _ts(1), 5.0, 2.0), (10, _ts(2), 7.0, None)],
        "k long, rt timestamp, a double, b double",
    )
    row = asof_join(
        left, right, left_on="k", right_on="k",
        left_time="t", right_time="rt", payload_cols=["a", "b"],
    ).collect()[0]
    assert row["a"] == 7.0
    assert row["b"] is None  # NOT 2.0 from the t=1 row
    assert row["asof_rt"] == _ts(2)
