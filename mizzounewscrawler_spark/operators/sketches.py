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
from pyspark.sql import Column, DataFrame, Window
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


# --------------------------------------------------------------------------
# HyperLogLog distinct counting (Flajolet et al. 2007) — deterministic,
# engine-mirrorable restatement.
#
# The scale problem: "how many distinct URLs has this 10^10-row frontier
# seen" — COUNT(DISTINCT) shuffles one row per distinct key; HLL keeps
# 2^p integer registers total.  Everything here is pinned to hex-string
# arithmetic over md5 so Spark and DuckDB produce BIT-IDENTICAL registers
# (no engine-private hash, no bit intrinsics):
#
# * bucket  = first p/4 hex chars of md5(key)           (p ∈ {4,8,12,16} bits)
# * word    = next 12 hex chars (a 48-bit tail)
# * rho     = leading-zero BITS of the word + 1 (all-zero word → 49),
#             computed as 4·(leading '0' hex chars) + a 16-way CASE on the
#             first non-zero hex digit — exact string/integer ops only.
#
# Registers merge by MAX — map-side combinable in one groupBy, and sketches
# from different days/tables union-merge with the same groupBy(max), which
# is the whole point at 100 TB: distinct-URL counts compose across
# partitions, snapshots, and clusters without ever reshuffling raw keys.
# The estimator (alpha_m · m² / Σ 2^-rho with the small-range linear
# correction) is the only floating step, applied to integer registers both
# engines agree on.  The 48-bit tail caps rho at 49 — irrelevant until
# ~2^40 distinct keys per bucket; production p=14 gives the standard
# ±1.04/√m ≈ 0.8% error.
# --------------------------------------------------------------------------

HLL_P = 12


def hll_registers(df: DataFrame, key_col: str, p: int = HLL_P) -> DataFrame:
    """The sketch: one row per occupied bucket, (bucket, rho) with
    rho = max over the bucket's keys.  ``p`` must be a multiple of 4 (the
    bucket is hex-aligned so the SQL mirror is exact)."""
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError("hll_registers: p must be in {4, 8, 12, 16}")
    h = F.md5(F.col(key_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, p // 4), 16, 10).cast("long")
    w = F.substring(h, p // 4 + 1, 12)
    z = F.length(F.regexp_extract(w, "^0*", 0))
    first = F.substr(w, z + F.lit(1), F.lit(1))
    lz = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = F.when(z == 12, F.lit(49)).otherwise(z * 4 + lz + 1)
    return (
        df.where(F.col(key_col).isNotNull())
        .select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union-merge register tables (same p): groupBy(bucket).max(rho)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame, p: int = HLL_P) -> DataFrame:
    """One-row estimate from a register table: (n_buckets, zero_buckets,
    est_distinct).  Standard HLL estimator with the small-range linear
    counting correction; est rounded to 4 decimals.  Stays a DataFrame —
    the aggregation is distributed, the formula is one scalar row."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.agg(
        F.count(F.lit(1)).alias("occupied"),
        # coalesce: an EMPTY register table (no keys seen yet) sums to
        # NULL — pin s=0 so the linear-counting branch yields est=0
        # instead of a NULL estimate
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("rho"))), F.lit(0.0)
        ).alias("s"),
    )
    v = F.lit(m) - F.col("occupied")
    raw = F.lit(alpha * m * m) / (F.col("s") + v.cast("double"))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(
        F.lit(m).alias("n_buckets"),
        v.cast("long").alias("zero_buckets"),
        F.round(est, 4).alias("est_distinct"),
    )


def approx_distinct(df: DataFrame, key_col: str, p: int = HLL_P) -> DataFrame:
    """Sketch + estimate in one call: one-row (n_buckets, zero_buckets,
    est_distinct) for ``key_col``."""
    return hll_estimate(hll_registers(df, key_col, p), p)


# --------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — deterministic,
# engine-mirrorable restatement; the frequency companion to the HLL above.
#
# The scale problem: point-frequency estimates ("how often has this URL /
# host / shingle appeared") over 10^12 rows without a per-distinct-key
# shuffle.  The sketch is a d × w integer grid: row i increments column
# md5(i ':' key) mod w; a key's estimate is the MIN over its d cells —
# always ≥ the true count, within εN (ε = e/w) with probability 1−δ
# (δ = e^−d).  Like the HLL registers, the grid is
#
# * integer-exact and hash-pinned (md5 hex arithmetic only) — Spark and
#   DuckDB build BIT-IDENTICAL grids;
# * mergeable by cell-wise SUM — map-side combinable in one groupBy, and
#   grids from different days/tables/clusters add, so frequency state
#   composes across snapshots exactly like the crawl's counters;
# * O(d·w) total — broadcast-sized by construction, never keyed by the
#   (unbounded) key domain.
#
# Unlike Misra-Gries above (which prunes candidates for an EXACT top-k
# recount), the CMS answers arbitrary after-the-fact point queries
# without rescanning — the two sketches cover different questions.
# --------------------------------------------------------------------------

CMS_D = 4
CMS_W = 1024


def _cms_col(key: Column, row: int, w: int) -> Column:
    """Column index of ``key`` in sketch row ``row``: first 8 hex chars of
    md5('<row>:'||key) mod w — 32 bits, exact in long arithmetic."""
    h = F.md5(F.concat_ws(":", F.lit(str(row)), key.cast("string")))
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(w))


def cms_sketch(
    df: DataFrame, key_col: str, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Build the grid: one output row per non-empty cell, (row, col, cnt).
    One groupBy over d·n exploded cells with map-side partial sums — the
    shuffle carries at most d·w rows per task."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _cms_col(F.col(key_col), i, w).alias("col"),
            )
            for i in range(d)
        ]
    )
    return (
        df.where(F.col(key_col).isNotNull())
        .select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of same-shape grids (the linearity property)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_query(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Point estimates for ``keys``: (key_col, est) with est = min over
    the key's d cells (missing cell → 0).  The grid is O(d·w) and
    broadcast; each key probes d cells via one broadcast join — no
    shuffle of the key stream beyond its own distinct."""
    probes = keys.select(key_col).where(F.col(key_col).isNotNull()).distinct()
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _cms_col(F.col(key_col), i, w).alias("col"),
            )
            for i in range(d)
        ]
    )
    exploded = probes.select(key_col, F.explode(cells).alias("c")).select(
        key_col, F.col("c.row").alias("row"), F.col("c.col").alias("col")
    )
    return (
        exploded.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


# --------------------------------------------------------------------------
# Log-binned quantile sketch (HDR-histogram / DDSketch shape) — the
# mergeable quantile companion to the MG / HLL / CMS sketches above.
#
# The scale problem: quantiles over 10^12 values need a full sort per
# group via the exact path (exact_group_quantiles).  The sketch bins each
# positive integer value by (exponent, top mantissa bits):
#
#   e     = floor(log2 v)  — computed as length(bin(v)) − 1, a STRING
#           length, so both engines agree exactly (no floating log);
#   shift = max(e − m, 0)
#   top   = floor(v / 2^shift)  (the top m+1 significant bits)
#
# Bucket counts merge by SUM (map-side combinable; grids from different
# days/partitions add), and the bucket lower bound (top << shift)
# under-estimates any member by a factor < 1 + 2^−m — DDSketch's
# relative-error guarantee with γ = 2^(2^−m), from integer/string ops
# only.  All arithmetic is exact for v < 2^53 (the float floor-div is
# used because Spark's shiftright binds its distance at plan time;
# 2^53 covers any count/latency/price domain by orders of magnitude).
# Values are the caller's job to make positive integers (scale cents,
# micros, token counts); rows with NULL or v < 1 are dropped.
# --------------------------------------------------------------------------

HDR_MANTISSA_BITS = 3


def log_histogram(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    mantissa_bits: int = HDR_MANTISSA_BITS,
) -> DataFrame:
    """The sketch: (group_cols..., e, top, cnt) per occupied bucket."""
    g = group_cols or []
    v = F.col(value_col).cast("long")
    e = (F.length(F.bin(v)) - 1).cast("int")
    shift = F.greatest(e - F.lit(mantissa_bits), F.lit(0))
    top = F.floor(v / F.pow(F.lit(2.0), shift)).cast("long")
    return (
        df.where(v >= 1)
        .select(*g, e.alias("e"), top.alias("top"))
        .groupBy(*g, "e", "top")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def log_histogram_merge(*hists: DataFrame) -> DataFrame:
    """Union-merge sketches with identical grouping/mantissa: bucket sum."""
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def histogram_quantile(
    hist: DataFrame,
    p: int,
    group_cols: list[str] | None = None,
    mantissa_bits: int = HDR_MANTISSA_BITS,
) -> DataFrame:
    """Quantile estimate from a log_histogram: per group, the LOWER BOUND
    of the bucket holding the discrete-lower rank ``(n−1)·p div 100 + 1``
    (same rank convention as ``exact_group_quantiles``, so sketch and
    exact answers are directly comparable).  Returns (group_cols..., p,
    n, est) with ``est ≤ true ≤ est·(1 + 2^−mantissa_bits)``.  One keyed
    window over the (tiny) bucket table — the data was never sorted."""
    g = group_cols or []
    part = Window.partitionBy(*g) if g else Window.partitionBy(F.lit(1))
    order = part.orderBy("e", "top")
    cum = F.sum("cnt").over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = F.sum("cnt").over(part)
    shift = F.greatest(F.col("e") - F.lit(mantissa_bits), F.lit(0))
    lo = (
        F.col("top") * F.pow(F.lit(2.0), shift)
    ).cast("long")
    ranked = hist.select(
        *g,
        "cnt",
        cum.alias("_cum"),
        tot.alias("_n"),
        lo.alias("_lo"),
    ).withColumn(
        "_rank", ((F.col("_n") - 1) * F.lit(p) / F.lit(100)).cast("long") + 1
    )
    return (
        ranked.where(
            (F.col("_cum") >= F.col("_rank"))
            & (F.col("_cum") - F.col("cnt") < F.col("_rank"))
        )
        .select(
            *g,
            F.lit(p).alias("p"),
            F.col("_n").alias("n"),
            F.col("_lo").alias("est"),
        )
    )
