"""Deterministic corpus sampling: hash splits and stratified per-group caps.

A training-data pipeline needs two sampling primitives the reference engine
has no analog for (its exports are all-or-nothing dataset dumps,
/root/reference/src/cli/commands/dataset.py):

* **hash_split** — assign every document to train/val/test by a hash of its
  id.  The assignment must be (a) a pure per-row map (no shuffle, no state:
  at 100 TB the split is a free column, not a job), (b) stable under
  repartitioning, re-runs, and engine versions (md5 is pinned forever;
  Spark's ``hash``/``xxhash64`` are engine-internal and ``rand(seed)`` is
  partition-dependent), and (c) disjoint and exhaustive.  Bucket = the
  first 4 hex chars of ``md5(id)`` parsed as an integer — uniform over
  [0, 65536) — compared against cumulative weight thresholds.  Thresholds
  are computed in integer arithmetic so the same literal boundaries appear
  in the SQL mirror.

* **stratified_sample** — keep at most ``k`` rows per group, chosen by
  md5-order (a uniform "hash-min" sample: deterministic, yet unbiased
  w.r.t. any data ordering).  The naive plan — one global window over the
  group — sorts every row of a hot group in one task.  This runs the
  two-phase top-k instead: phase 1 takes each *input partition's* local
  top-k per group (window over (group, spark_partition_id): the shuffle key
  carries the partition id, so a hot group spreads over all partitions);
  phase 2 runs the exact window over the survivors, of which there are at
  most partitions x k per group.  Any superset of the global top-k that is
  closed under per-partition selection is admissible for phase 1, so the
  result is independent of the physical partitioning (pinned by
  tests/test_partitioning_invariance.py-style checks in test_sampling.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 65536  # first 4 hex chars of md5


def split_bucket_expr(id_col: Column) -> Column:
    """Uniform bucket in [0, 65536) from the md5 of the row id (JVM-side)."""
    return F.conv(F.substring(F.md5(id_col.cast("string")), 1, 4), 16, 10).cast(
        "int"
    )


def split_thresholds(weights: dict[str, int]) -> list[tuple[str, int]]:
    """(name, exclusive upper bucket bound) per split, in declaration order.

    ``weights`` are integer percents summing to 100; bounds use integer
    arithmetic (``cum * BUCKETS div 100``) so the SQL mirror can embed the
    identical literals.  The last bound is exactly BUCKETS — exhaustive.
    """
    if sum(weights.values()) != 100:
        raise ValueError(f"split weights must sum to 100: {weights}")
    out, cum = [], 0
    for name, w in weights.items():
        cum += w
        out.append((name, cum * BUCKETS // 100))
    return out


def hash_split(
    df: DataFrame, id_col: str, weights: dict[str, int], out_col: str = "split"
) -> DataFrame:
    """Add ``out_col`` assigning each row to a named split — a pure
    deterministic per-row map (no shuffle; survives repartitioning)."""
    bucket = split_bucket_expr(F.col(id_col))
    expr = None
    for name, bound in split_thresholds(weights):
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    return df.withColumn(out_col, expr)


def mixture_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    rates_pct: dict[str, int],
    default_pct: int = 100,
) -> DataFrame:
    """Per-group deterministic subsampling — training-mixture weights.

    Keeps each row iff its md5 bucket clears the group's rate: a source
    with ``rates_pct['forums'] = 25`` contributes ~25% of its rows, chosen
    by the same pinned md5 hash as :func:`hash_split` (stable under
    repartitioning/re-runs; a row kept at 25% is still kept at 50% —
    rates are MONOTONE, so raising a source's weight only adds documents,
    the property that makes mixture re-weighting reproducible across
    training runs).  Pure per-row map: no shuffle, free at 100 TB.

    Groups absent from ``rates_pct`` fall back to ``default_pct``.
    Thresholds use the same integer arithmetic as ``split_thresholds``
    (``pct * BUCKETS div 100``) so SQL mirrors embed identical literals.
    """
    for name, pct in rates_pct.items():
        if not 0 <= pct <= 100:
            raise ValueError(f"rate out of [0,100] for {name!r}: {pct}")
    bucket = split_bucket_expr(F.col(id_col))
    thr: Column = F.lit(default_pct * BUCKETS // 100)
    for name, pct in rates_pct.items():
        thr = F.when(
            F.col(group_col) == F.lit(name), F.lit(pct * BUCKETS // 100)
        ).otherwise(thr)
    return df.where(bucket < thr)


def stratified_sample(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """At most ``k`` rows per group, md5-hash order (two-phase exact top-k).

    Returns the input columns plus ``rank_col`` (1-based within the group).
    ``id_col`` must be unique — it makes the md5 sort key total, so the
    sample is deterministic.
    """
    key = F.md5(F.col(id_col).cast("string"))
    # phase 1: local top-k per (group, input partition) — hot groups spread
    # across the (group, pid) shuffle key; any partition's local top-k is a
    # superset of its members of the global top-k
    w_local = Window.partitionBy(group_col, "_pid").orderBy(key)
    pruned = (
        df.withColumn("_pid", F.spark_partition_id())
        .withColumn("_rn", F.row_number().over(w_local))
        .where(F.col("_rn") <= k)
        .drop("_pid", "_rn")
    )
    # phase 2: exact rank over the <= partitions*k survivors per group
    w_global = Window.partitionBy(group_col).orderBy(key)
    return (
        pruned.withColumn(rank_col, F.row_number().over(w_global))
        .where(F.col(rank_col) <= k)
    )


def global_shuffle(
    df: DataFrame,
    id_col: str,
    seed: str = "42",
    shard_size: int | None = None,
    rank_col: str = "shuffle_rank",
    shard_col: str = "shard",
) -> DataFrame:
    """Deterministic global corpus shuffle — the standard pre-training
    step that decorrelates adjacent documents (same crawl host, same
    dump) before sequence packing.

    The shuffle key is ``md5(seed ':' id)``: a full sort on a uniform
    high-entropy key, which Spark executes as ONE range-partitioned
    shuffle (sampled range boundaries, no skew — the canonical way to
    shuffle 100 TB; a ``rand()``-keyed sort would not be reproducible
    across retries/partitionings, an md5 key is).  ``rank_col`` is the
    0-based global shuffle position; with ``shard_size`` set, ``shard``
    = rank div shard_size assigns contiguous shuffled shards for the
    training loader — shard contents are stable under any input
    partitioning and any rerun (pinned in tests).

    ``id_col`` must be unique (it makes the sort key total).  Note the
    global ``row_number`` window is single-partition at the very end; at
    true 100-TB scale write ``sortWithinPartitions(key)`` output and
    derive ranks from (range-partition id, local rank) instead — the
    shard ASSIGNMENT here stays identical because the range partitioner
    preserves the global key order across partition boundaries.
    """
    key = F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    out = df.withColumn(
        rank_col,
        F.row_number().over(Window.orderBy(key, F.col(id_col))) - 1,
    )
    if shard_size is not None:
        out = out.withColumn(
            shard_col, (F.col(rank_col) / F.lit(shard_size)).cast("int")
        )
    return out
