"""Temporal joins Spark lacks natively: backward as-of join.

An as-of join attaches, to every left row, the latest right row of the same
key whose time is ≤ the left row's time — the standard "state as of event
time" primitive (pandas ``merge_asof``, DuckDB ``ASOF JOIN``; the reference
engine has no analog — its per-article lookups are point SQL queries).

Spark has no AsofJoin operator, so this is the scale-correct composition:

    union both sides (tagged) → one shuffle on the key → per-key time sort →
    ``last(payload, ignorenulls=True)`` running window → keep left rows.

One exchange, one sort — the same cost as a merge join.  NOT an
inequality-join (which Catalyst would plan as a broadcast-nested-loop or a
range cross product) and no per-key ``collect_list``: per-row state is O(1)
inside the running window, so a 10^10-row fact side costs exactly its
shuffle.  Hot keys land in one partition, as with any keyed window — salt
upstream if a single key exceeds a partition (same note as the scheduler's
wave sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TIME = "_asof_t"
_TAG = "_asof_tag"
_KEY = "_asof_k"
_RPAY = "_asof_pay"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    tolerance_days: int | None = None,
) -> DataFrame:
    """Backward as-of join (inclusive: a right row AT the left row's time
    matches).  Returns every ``left`` row plus ``payload_cols`` from the
    latest matching ``right`` row, null when no right row precedes it (or
    the match is older than ``tolerance_days``).

    ``right`` must be unique per (key, time) — pre-aggregate ties upstream
    so the matched row (and therefore the result) is deterministic.
    """
    overlap = set(payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"payload collides with left columns: {sorted(overlap)}")
    fill_cols = list(dict.fromkeys([*payload_cols, right_time]))
    rtypes = {f.name: f.dataType for f in right.schema.fields}
    ltypes = {f.name: f.dataType for f in left.schema.fields}

    # the entire matched right row travels as ONE struct: filling payload
    # columns independently would stitch together values from DIFFERENT
    # right rows whenever the latest match carries a NULL in one of them
    # (last(ignorenulls) per column reaches further back per column) —
    # a row that never existed.  The struct is non-null exactly on right
    # rows, so last(struct, ignorenulls=True) selects whole rows.
    pay_t = (
        "struct<"
        + ",".join(f"`{c}`:{rtypes[c].simpleString()}" for c in fill_cols)
        + ">"
    )
    l2 = left.select(
        F.col(left_on).alias(_KEY),
        F.col(left_time).cast("timestamp").alias(_TIME),
        F.lit(1).alias(_TAG),
        *[F.col(c) for c in left.columns],
        F.lit(None).cast(pay_t).alias(_RPAY),
    )
    r2 = right.select(
        F.col(right_on).alias(_KEY),
        F.col(right_time).cast("timestamp").alias(_TIME),
        F.lit(0).alias(_TAG),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left.columns],
        F.struct(*[F.col(c).alias(c) for c in fill_cols]).alias(_RPAY),
    )
    # right rows sort before left rows at equal time (_TAG asc) → inclusive.
    w = (
        Window.partitionBy(_KEY)
        .orderBy(F.col(_TIME).asc(), F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l2.unionByName(r2).select(
        _TAG,
        _TIME,
        *[F.col(c) for c in left.columns],
        F.last(_RPAY, ignorenulls=True).over(w).alias(_RPAY),
    )
    out = filled.where(F.col(_TAG) == 1)
    if tolerance_days is not None:
        fresh = F.datediff(
            F.to_date(F.col(_TIME)),
            F.to_date(F.col(_RPAY)[right_time]),
        ) <= F.lit(tolerance_days)
        out = out.select(
            _TIME,
            *[F.col(c) for c in left.columns],
            F.when(fresh, F.col(_RPAY)).alias(_RPAY),
        )
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.col(_RPAY)[c].alias(c) for c in payload_cols],
        F.col(_RPAY)[right_time].alias("asof_" + right_time),
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_key: str,
    interval_key: str,
    time_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Interval-containment join: every (point, interval) pair with matching
    keys and ``start ≤ time < end``.  Returns the point columns plus the
    interval columns.

    A raw inequality join would plan as a per-key cross product, so the
    intervals are exploded into the day buckets they cover and the join
    runs as an equi-join on (key, day) followed by the exact containment
    filter — the standard interval-bucketing recipe (cf. Spark's range-join
    hints on Databricks / the bucketed variant in Flink SQL).  Cost: each
    interval is replicated once per covered day, so the fan-out is
    span/bucket — right-sized for day-scale windows; re-bucket upstream for
    month-long spans.  Both sides shuffle on the uniform (key, day) pair,
    never on the key alone, so one hot key with many days still spreads.
    """
    days = F.sequence(
        F.to_date(F.col(start_col)), F.to_date(F.col(end_col))
    )
    iv = intervals.select("*", F.explode(days).alias("_day"))
    pts = points.withColumn("_day", F.to_date(F.col(time_col)))
    exact = (
        (F.col(time_col) >= F.col(start_col))
        & (F.col(time_col) < F.col(end_col))
    )
    return (
        pts.join(
            iv,
            (pts[point_key] == iv[interval_key]) & (pts["_day"] == iv["_day"]),
        )
        .where(exact)
        .drop("_day")
    )
