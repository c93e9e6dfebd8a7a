"""Politeness-aware wave scheduler.

Restates the reference's imperative politeness machinery as one declarative
wave-build plan (SURVEY.md §2.9):

- per-host exclusive ownership — reference: FastAPI work-queue handing out
  exclusive domains with heartbeats (/root/reference/src/services/work_queue.py:237-273)
  → here: free, via partitioning (every URL of a host lands in one task).
- per-host batch cap ≤3 — reference MAX_ARTICLES_PER_DOMAIN_PER_BATCH
  (/root/reference/src/cli/commands/extraction.py:1093) → ``row_number() ≤ budget``.
- bot-sensitivity tier → inter-request delay — reference
  BOT_SENSITIVITY_CONFIG uniform(min,max) per tier
  (/root/reference/src/utils/bot_sensitivity_manager.py:21-112) → the
  deterministic tier midpoint (no RNG; reproducibility requirement).
- crawl-delay budget: a host may emit ⌊wave_duration / delay⌋ URLs per wave,
  delay = max(tier delay, robots crawl_delay), capped by the batch cap.
- failure backoff 60·2^(n−1)s capped 3600, 3 consecutive failures → 30 min
  pause — reference work_queue.py:40-42,400-434 → host_state columns.
- deterministic ordering replacing ``ORDER BY RANDOM()``
  (/root/reference/src/cli/commands/extraction.py:1141): within host and
  globally, (priority DESC, url_hash ASC) — reproducible "random" mixing
  because url_hash is uniform (SURVEY.md §2.6 O1).

Skew note (the 100 TB story): wave output is bounded per host by the budget
(≤3), so the fetch stage cannot skew no matter how hot a host is.  The heavy
skew lives in *discovery* (a hot host contributes most new links), and those
flows shuffle on ``url_hash`` — uniform by construction.  Host-keyed
aggregations over raw discoveries use :func:`salted_host_key` two-phase
aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# deterministic midpoints of the reference's uniform(min,max) tier delays
# (/root/reference/src/utils/bot_sensitivity_manager.py:21-112)
TIER_DELAY_S = {
    1: 1.0,
    2: 2.0,
    3: 3.5,
    4: 6.0,
    5: 8.5,
    6: 12.0,
    7: 17.5,
    8: 25.0,
    9: 45.0,
    10: 67.5,
}

MAX_PER_HOST_PER_WAVE = 3  # reference extraction.py:1093
FAILURE_PAUSE_AFTER = 3  # reference work_queue.py:41
FAILURE_PAUSE_S = 1800.0  # reference work_queue.py:42
BACKOFF_BASE_S = 60.0  # reference crawler/__init__.py:1097-1142
BACKOFF_CAP_S = 3600.0


def tier_delay_expr(sensitivity: Column) -> Column:
    expr = F.lit(TIER_DELAY_S[5])
    for tier, delay in TIER_DELAY_S.items():
        expr = F.when(sensitivity == tier, F.lit(delay)).otherwise(expr)
    return expr


def host_budget_expr(
    sensitivity: Column,
    robots_delay: Column,
    wave_duration: float,
    max_per_host: int = MAX_PER_HOST_PER_WAVE,
) -> Column:
    """URLs a host may emit this wave: min(cap, ⌊wave/delay⌋), ≥1."""
    delay = F.greatest(tier_delay_expr(sensitivity), F.coalesce(robots_delay, F.lit(0.0)))
    by_delay = F.floor(F.lit(wave_duration) / delay).cast("int")
    return F.greatest(F.least(F.lit(max_per_host), by_delay), F.lit(1))


def build_wave(
    frontier: DataFrame,
    seeds: DataFrame,
    robots: DataFrame,
    host_state: DataFrame | None,
    wave_ts: float,
    wave_duration: float = 60.0,
    max_per_host: int = MAX_PER_HOST_PER_WAVE,
    with_global_order: bool = True,
    host_dim: DataFrame | None = None,
) -> DataFrame:
    """Select this wave's fetch set from the frontier.

    ``frontier`` must carry (url, url_surt, url_hash, host, priority, depth,
    status) with status='discovered'.  Returns those columns plus ``seq``
    (global deterministic order) when requested.

    ``host_dim`` (host, bot_sensitivity, crawl_delay) is the pre-fused,
    cached host dimension: passing it replaces two broadcast joins (seeds +
    robots) with one — per-wave stage latency is driver-bound and does not
    shrink with cluster size, so the wave loop pre-fuses loop-invariant
    dimensions once (crawl.run_crawl).
    """
    ready = frontier.where(F.col("status") == "discovered")

    # host dimension: sensitivity from seeds, crawl_delay from robots — both
    # #hosts-sized → broadcast joins (one join when pre-fused).
    if host_dim is not None:
        hd = host_dim.select(
            F.col("host").alias("_s_host"),
            F.col("bot_sensitivity").alias("_sens"),
            F.col("crawl_delay").alias("_rdelay"),
        )
        ready = ready.join(
            F.broadcast(hd), ready["host"] == hd["_s_host"], "left"
        ).drop("_s_host")
    else:
        sens = seeds.select(
            F.col("host").alias("_s_host"), F.col("bot_sensitivity").alias("_sens")
        )
        delays = robots.where(F.col("user_agent") == "*").select(
            F.col("host").alias("_r_host"), F.col("crawl_delay").alias("_rdelay")
        )
        ready = (
            ready.join(F.broadcast(sens), ready["host"] == sens["_s_host"], "left")
            .drop("_s_host")
            .join(F.broadcast(delays), ready["host"] == delays["_r_host"], "left")
            .drop("_r_host")
        )

    # exclude hosts paused / in backoff (host_state is #hosts-sized → broadcast)
    if host_state is not None:
        hs = host_state.select(
            F.col("host").alias("_h_host"),
            F.col("backoff_until").alias("_backoff_until"),
        )
        ready = (
            ready.join(F.broadcast(hs), ready["host"] == hs["_h_host"], "left")
            .drop("_h_host")
            .where(
                F.col("_backoff_until").isNull()
                | (F.col("_backoff_until") <= F.lit(wave_ts))
            )
            .drop("_backoff_until")
        )

    budget = host_budget_expr(
        F.coalesce(F.col("_sens"), F.lit(5)),
        F.col("_rdelay"),
        wave_duration,
        max_per_host,
    )
    in_host = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("url_hash").asc()
    )
    picked = (
        ready.withColumn("_budget", budget)
        .withColumn("_rn", F.row_number().over(in_host))
        .where(F.col("_rn") <= F.col("_budget"))
        .drop("_rn", "_budget", "_sens", "_rdelay")
    )
    if with_global_order:
        # global deterministic sequence — the crawl-order parity artifact.
        # A total sort of ≤ (#hosts × cap) rows per wave: small by
        # construction (the wave is the politeness-bounded set, not the
        # frontier), so this never becomes the scale bottleneck.
        g = Window.orderBy(F.col("priority").desc(), F.col("url_hash").asc())
        picked = picked.withColumn("seq", F.row_number().over(g))
    return picked


def salted_host_key(host: Column, nsalts: int, salt_on: Column) -> Column:
    """Two-phase-aggregation key for host-keyed stats over skewed data:
    (host, xxhash64(salt_on) % nsalts).  Aggregate per salted key first,
    then re-aggregate per host — the hot host fans out over ``nsalts``
    reducers instead of one."""
    return F.concat_ws(
        "#", host, F.pmod(F.xxhash64(salt_on), F.lit(nsalts)).cast("string")
    )


# --------------------------------------------------------------------------
# host politeness state (updated after every wave)
# --------------------------------------------------------------------------

HOST_STATE_SCHEMA = (
    "host string, consecutive_failures int, backoff_until double, "
    "last_wave int, fetched_total long"
)


def update_host_state(
    host_state: DataFrame | None,
    wave_results: DataFrame,
    wave_ts: float,
    wave_idx: int,
) -> DataFrame:
    """MERGE-style host-state update from this wave's fetch results.

    ``wave_results`` needs (host, ok boolean).  Failure semantics per the
    reference: consecutive failures reset on any success; ≥3 consecutive
    failures → 30 min pause; otherwise exponential backoff 60·2^(n−1)s
    capped at 1 h (work_queue.py:400-434; crawler/__init__.py:1097-1142).
    """
    per_host = wave_results.groupBy("host").agg(
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("_succ"),
        F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("_fail"),
    )
    if host_state is None:
        merged = per_host.select(
            "host",
            F.lit(0).alias("consecutive_failures"),
            F.lit(None).cast("double").alias("backoff_until"),
            F.lit(0).alias("last_wave"),
            F.lit(0).cast("long").alias("fetched_total"),
            "_succ",
            "_fail",
        )
    else:
        merged = host_state.join(per_host, "host", "full").fillna(
            {"_succ": 0, "_fail": 0, "consecutive_failures": 0, "fetched_total": 0}
        )
    new_consec = (
        F.when(F.col("_succ") > 0, F.lit(0))
        .otherwise(F.col("consecutive_failures") + F.col("_fail"))
        .cast("int")
    )
    backoff = F.when(
        new_consec >= FAILURE_PAUSE_AFTER, F.lit(wave_ts + FAILURE_PAUSE_S)
    ).otherwise(
        F.when(
            new_consec > 0,
            F.lit(wave_ts)
            + F.least(
                F.lit(BACKOFF_BASE_S) * F.pow(F.lit(2.0), new_consec - 1),
                F.lit(BACKOFF_CAP_S),
            ),
        ).otherwise(F.lit(None).cast("double"))
    )
    return merged.select(
        "host",
        new_consec.alias("consecutive_failures"),
        backoff.alias("backoff_until"),
        F.lit(wave_idx).alias("last_wave"),
        (F.col("fetched_total") + F.col("_succ")).cast("long").alias("fetched_total"),
    )
