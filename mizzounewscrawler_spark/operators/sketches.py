"""Frequency sketches: exact heavy hitters via candidate pruning.

The scale problem: "top-k most frequent keys" over 10^12 rows with a huge
key domain (URLs, shingles, hosts).  A plain ``groupBy(key).count()``
shuffles one row per *distinct key* — fine for hosts, ruinous for
shingles.  The classic two-phase answer:

1. **Per-partition Misra-Gries summary** (``mapInPandas``, O(capacity)
   memory per task, no shuffle): any key whose global frequency exceeds
   N/(capacity+1) is guaranteed to survive in at least one partition's
   summary (pigeonhole over the per-partition MG bound), so the union of
   the per-partition candidate sets is a superset of every sufficiently
   heavy key.
2. **Exact recount of candidates only**: broadcast-semi-join the raw rows
   on the candidate set, exact ``groupBy.count``, exact top-k with a
   deterministic (count desc, key asc) tiebreak.  The shuffle now carries
   only candidate keys — at most ``partitions × capacity`` of them.

The result is EXACT (phase 2 recounts from the raw data; the sketch only
prunes), which is why the catalog entry carries a plain GROUP BY / ORDER
BY / LIMIT oracle.  Completeness holds whenever the true k-th count
exceeds N/(capacity+1); ``heavy_hitters`` verifies that bound post-hoc
and raises if the distribution is too flat for the chosen capacity
(caller then either raises ``capacity`` or falls back to the full
groupBy).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _mg_merge(counters: dict, vc: "pd.Series", capacity: int) -> dict:
    """Merge a batch's value_counts into a Misra-Gries summary of at most
    ``capacity`` counters (batched decrement: subtract the overflow
    quantile from everyone, drop the non-positive)."""
    for key, cnt in vc.items():
        counters[key] = counters.get(key, 0) + int(cnt)
    if len(counters) > capacity:
        # decrement all by the smallest value that leaves ≤ capacity keys
        spill = sorted(counters.values())[len(counters) - capacity - 1]
        counters = {k: v - spill for k, v in counters.items() if v > spill}
    return counters


def _mg_summaries(df: DataFrame, key_col: str, capacity: int) -> DataFrame:
    """Per-partition MG candidate keys, each partition's row count riding
    on its first output row (``_pn``) — candidates AND the total N come
    out of the single phase-1 pass, no dedicated count scan."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n = 0
        for pdf in batches:
            n += len(pdf)
            counters = _mg_merge(counters, pdf[key_col].value_counts(), capacity)
        keys = list(counters.keys())
        if keys:
            yield pd.DataFrame(
                {key_col: keys, "_pn": [n] + [0] * (len(keys) - 1)}
            )
        elif n:  # flat partition: MG spilled every key, but n must survive
            yield pd.DataFrame({key_col: [None], "_pn": [n]})

    return df.select(key_col).mapInPandas(
        summarize,
        f"{key_col} {df.schema[key_col].dataType.simpleString()}, _pn long",
    )


def mg_candidates(df: DataFrame, key_col: str, capacity: int) -> DataFrame:
    """Phase 1: distinct candidate keys from per-partition MG summaries."""
    return (
        _mg_summaries(df, key_col, capacity)
        .where(F.col(key_col).isNotNull())
        .select(key_col)
        .distinct()
    )


def exact_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tie_col: str,
    percents: list[int],
) -> DataFrame:
    """Exact per-group discrete quantiles (lower variant), all-integer rank
    math so the result is bit-identical across engines and partitionings.

    The continuous (interpolated) percentile mixes values in floating
    point, which is sum-order-stable but *engine-formula*-dependent; the
    discrete variant instead returns the element at integer rank
    ``(n-1)*p div 100 + 1`` in ``(value, tie)`` order — no floats anywhere
    but the data itself.  Plan: one shuffle on the group key (window sort),
    then a map-side-combinable ``max(when(rn == idx))`` per requested
    percent.  Hot groups sort in one task — same caveat/salting note as
    every keyed window; at the telemetry cardinalities this serves
    (per-host, per-method) groups are bounded by the politeness budget.

    Returns one row per group: ``n`` plus a ``p{P}`` column per percent.
    """
    w = Window.partitionBy(group_col).orderBy(value_col, tie_col)
    wn = Window.partitionBy(group_col)
    ranked = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(wn)
    )
    aggs = [F.max("_n").alias("n")]
    for p in percents:
        idx = F.expr(f"((_n - 1) * {p}) div 100") + F.lit(1)
        aggs.append(
            F.max(F.when(F.col("_rn") == idx, F.col(value_col))).alias(f"p{p}")
        )
    return ranked.groupBy(group_col).agg(*aggs)


def heavy_hitters(
    df: DataFrame, key_col: str, k: int, capacity: int | None = None
) -> DataFrame:
    """Exact top-``k`` keys by frequency, (count desc, key asc) order.

    ``capacity`` defaults to 64·k — the MG guarantee then covers any key
    with frequency > N/(64k+1); the post-hoc check below asserts the
    returned k-th count clears that bar, i.e. the candidate set provably
    contained the true top-k.
    """
    capacity = capacity or 64 * k
    # ONE pass computes both the candidate set and N (each partition's row
    # count rides the summary) — a dedicated df.count() would be a third
    # full scan of the input at the 10^12-row design point
    summ = _mg_summaries(df, key_col, capacity).cache()
    try:
        n_total = summ.agg(F.sum("_pn").alias("n")).collect()[0]["n"] or 0
        cand = summ.where(F.col(key_col).isNotNull()).select(key_col).distinct()
        counted = (
            df.join(F.broadcast(cand), key_col, "left_semi")
            .groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        top = counted.orderBy(F.col("cnt").desc(), F.col(key_col).asc()).limit(k)
        rows = top.collect()
    finally:
        summ.unpersist()
    # Certification: the MG bound covers every key with freq > N/(cap+1),
    # so the candidate set provably contains the true top-k iff the k-th
    # candidate count clears that bar.  Fewer than k candidates means MG
    # spilled the tail away (flat distribution) — equally uncertifiable:
    # we cannot tell "input has < k distinct keys" from "sketch lost them".
    if len(rows) < k or rows[-1]["cnt"] * (capacity + 1) <= n_total:
        kth = rows[-1]["cnt"] if rows else 0
        raise ValueError(
            f"heavy_hitters: {len(rows)} candidates, k-th count {kth} ≤ "
            f"N/(capacity+1) = {n_total}/{capacity + 1} — the MG bound "
            "cannot certify completeness; raise capacity or use the exact "
            "groupBy path"
        )
    return df.sparkSession.createDataFrame(rows, top.schema)
