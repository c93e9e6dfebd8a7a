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

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mizzounewscrawler_spark.functions.exprcache import session_memo

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

# P8 sensitivity adaptation (reference SENSITIVITY_ADJUSTMENT_RULES,
# /root/reference/src/utils/bot_sensitivity_manager.py:116-122):
# captcha/challenge → +3, plain failures (429-like) → +1, cap at tier 10;
# decay one tier per SENSITIVITY_DECAY_WAVES quiet waves back toward base.
SENSITIVITY_CAPTCHA_DELTA = 3
SENSITIVITY_FAILURE_DELTA = 1
SENSITIVITY_MAX = 10
SENSITIVITY_DECAY_WAVES = 10

# P10 adaptive pause thresholds by cadence (reference
# _calculate_pause_threshold, src/crawler/source_processing.py:301-335):
# fast-cadence sources tolerate more consecutive failures before pausing.
PAUSE_THRESHOLD_BY_CADENCE = ((1.0, 7), (7.0, 5), (float("inf"), 3))
SOURCE_PAUSE_S = 86400.0  # paused sources sit out a day

# P1 frequency → cadence days (reference parse_frequency_to_days,
# src/crawler/scheduling.py:30-62)
FREQ_DAYS = {
    "daily": 0.25, "weekly": 3.5, "biweekly": 14.0, "monthly": 30.0,
}
FREQ_DEFAULT_DAYS = 7.0


def cadence_days_expr(frequency: Column) -> Column:
    expr = F.lit(FREQ_DEFAULT_DAYS)
    for name, days in FREQ_DAYS.items():
        expr = F.when(frequency == name, F.lit(days)).otherwise(expr)
    return expr


def is_source_url_expr(surt: Column) -> Column:
    """P1: a *source* URL — feed or homepage — the recrawl-cadence unit
    (reference sources = homepage + feeds, src/crawler/scheduling.py:101-162).
    A homepage SURT has an empty path and ends at the ``)`` host delimiter."""
    return surt.endswith(")/feed") | surt.endswith(")")


def pause_threshold_expr(cadence_days: Column) -> Column:
    """P10: daily-ish → 7 consecutive failures, weekly-ish → 5, slower → 3."""
    return (
        F.when(cadence_days <= 1.0, F.lit(PAUSE_THRESHOLD_BY_CADENCE[0][1]))
        .when(cadence_days <= 7.0, F.lit(PAUSE_THRESHOLD_BY_CADENCE[1][1]))
        .otherwise(F.lit(PAUSE_THRESHOLD_BY_CADENCE[2][1]))
    )


def feed_retry_window_s(cadence_days: Column) -> Column:
    """P11 RSS failure window: clamp(2×cadence, 2..7 days), in seconds
    (reference _rss_retry_window_days, src/crawler/discovery.py:1934-1949)."""
    days = F.least(F.greatest(cadence_days * 2, F.lit(2.0)), F.lit(7.0))
    return days * 86400.0


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


@session_memo
def _budget_expr_cached(wave_duration: float, max_per_host: int) -> Column:
    """Per-wave politeness budget over the standard joined column names —
    the ~40-node when-chain is rebuilt every wave otherwise (py4j plan
    latency = per-wave fixed driver cost, VERDICT r2)."""
    return host_budget_expr(
        F.coalesce(F.col("_adapted_sens"), F.col("_sens"), F.lit(5)),
        F.col("_rdelay"),
        wave_duration,
        max_per_host,
    )


@session_memo
def _wave_gate_parts() -> tuple:
    """(is_feed_url, is_src_url) trees for the host-state gates."""
    return (
        F.col("url_surt").endswith(")/feed"),
        is_source_url_expr(F.col("url_surt")),
    )


@session_memo
def _in_host_rn() -> Column:
    in_host = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("url_hash").asc()
    )
    return F.row_number().over(in_host)


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
    recrawl_sources: bool = False,
    salt_partitions: int = 1,
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

    # exclude hosts paused / in backoff (host_state is #hosts-sized → broadcast);
    # P11: a host inside its RSS retry window keeps crawling but its FEED
    # URLs sit out; P8: the adapted sensitivity tier (if present) overrides
    # the seeds' base tier in the budget below.
    if host_state is not None:
        hs = host_state
        for name, typ in (
            ("bot_sensitivity", "int"), ("feed_retry_until", "double"),
            ("source_next_due", "double"),
        ):
            if name not in hs.columns:
                hs = hs.withColumn(name, F.lit(None).cast(typ))
        hs = hs.select(
            F.col("host").alias("_h_host"),
            F.col("backoff_until").alias("_backoff_until"),
            F.col("bot_sensitivity").alias("_adapted_sens"),
            F.col("feed_retry_until").alias("_feed_retry"),
            F.col("source_next_due").alias("_src_due"),
        )
        is_feed_url, is_src_url = _wave_gate_parts()
        # all three gates in ONE where (one py4j call, one analyzer pass):
        # backoff window; P11 feed retry window (feed URLs only); P1 cadence
        # gate (recrawl mode ONLY): a host's source URLs (feed/homepage) sit
        # out until the cadence clock comes due.  In drain mode the cadence
        # gate must NOT apply — fetched sources leave the frontier
        # permanently, and gating would starve a not-yet-fetched source
        # (e.g. the homepage when only the feed fit wave 0's politeness
        # budget) for a whole cadence.
        w_ts = F.lit(wave_ts)
        gate = (
            (F.col("_backoff_until").isNull() | (F.col("_backoff_until") <= w_ts))
            & (
                ~is_feed_url
                | F.col("_feed_retry").isNull()
                | (F.col("_feed_retry") <= w_ts)
            )
            & (
                F.lit(not recrawl_sources)
                | ~is_src_url
                | F.col("_src_due").isNull()
                | (F.col("_src_due") <= w_ts)
            )
        )
        ready = (
            ready.join(F.broadcast(hs), ready["host"] == hs["_h_host"], "left")
            .drop("_h_host")
            .where(gate)
            .drop("_backoff_until", "_feed_retry", "_src_due")
        )
    else:
        ready = ready.withColumn("_adapted_sens", F.lit(None).cast("int"))

    ready = ready.withColumn(
        "_budget", _budget_expr_cached(wave_duration, max_per_host)
    )
    if salt_partitions > 1:
        # Hot-host skew guard (SURVEY risk #4): the plain per-host window
        # sorts ALL of a host's pending rows in one task — a trap host
        # with 10^7 frontier rows pins one core for the wave.  Two-stage
        # salted top-k is result-IDENTICAL: stage 1 ranks within (host,
        # salt-of-url_hash) and keeps each salt's top ``_budget`` (any
        # row in the host's true top-budget is also top-budget within its
        # own salt, so no winner is lost); stage 2 re-ranks the ≤
        # budget×nsalts survivors per host.  Stage 1's tasks are
        # max-host-rows/nsalts-sized; stage 2 is wave-sized.  The salt is
        # derived from url_hash, so both stages order by the SAME total
        # key and the final pick is byte-identical to the unsalted window
        # (tests/test_scheduler_robots.py parity).
        salted = Window.partitionBy(
            "host", F.pmod(F.xxhash64("url_hash"), F.lit(salt_partitions))
        ).orderBy(F.col("priority").desc(), F.col("url_hash").asc())
        ready = (
            ready.withColumn("_rn1", F.row_number().over(salted))
            .where(F.col("_rn1") <= F.col("_budget"))
            .drop("_rn1")
        )
    picked = (
        ready.withColumn("_rn", _in_host_rn())
        .where(F.col("_rn") <= F.col("_budget"))
        .drop("_rn", "_budget", "_sens", "_rdelay", "_adapted_sens")
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
    reducers instead of one.  Derive ``nsalts`` from the data with
    :func:`adaptive_nsalts` rather than guessing."""
    return F.concat_ws(
        "#", host, F.pmod(F.xxhash64(salt_on), F.lit(nsalts)).cast("string")
    )


def adaptive_nsalts(
    df: DataFrame,
    host_col: str = "host",
    rows_per_task: int = 200_000,
    max_salts: int = 256,
) -> int:
    """Derive the salt fan-out from the ACTUAL per-host histogram (VERDICT
    r4 next #5 — a caller-guessed ``nsalts`` either under-salts the hot
    host or taxes uniform data): one dimension-sized count agg (map-side
    partials, no sort) finds the hottest host; nsalts is the power of two
    that brings its partition under ``rows_per_task``.  Returns 1 when no
    host exceeds the target — the caller then skips salting entirely, so
    uniform frontiers never pay the two-stage window.  The callers gate
    the histogram job itself behind a frontier-size trigger
    (CrawlConfig.salt_trigger_rows) so sandbox-scale waves pay nothing."""
    row = (
        df.groupBy(host_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"))
        .first()
    )
    mx = int(row["mx"] or 0)
    if mx <= rows_per_task:
        return 1
    return int(min(max_salts, 2 ** math.ceil(math.log2(mx / rows_per_task))))


# --------------------------------------------------------------------------
# host politeness state (updated after every wave)
# --------------------------------------------------------------------------

HOST_STATE_SCHEMA = (
    "host string, consecutive_failures int, backoff_until double, "
    "last_wave int, fetched_total long, bot_sensitivity int, "
    "sens_event_wave int, paused_reason string, feed_retry_until double, "
    "source_next_due double"
)

_STATE_DEFAULTS = {
    "_succ": 0, "_fail": 0, "_captcha": 0, "_feed_ok": 0, "_feed_fail": 0,
    "_src_evt": 0, "consecutive_failures": 0, "fetched_total": 0,
}


def update_host_state(
    host_state: DataFrame | None,
    wave_results: DataFrame,
    wave_ts: float,
    wave_idx: int,
    host_dim: DataFrame | None = None,
) -> DataFrame:
    """MERGE-style host-state update from this wave's fetch results.

    ``wave_results`` needs (host, ok boolean); optional columns ``challenge``
    (captcha/challenge page seen) and ``is_feed`` (row was a feed fetch)
    enable P8 sensitivity adaptation and P11 RSS failure windows.
    ``host_dim`` (host, bot_sensitivity [, cadence_days]) supplies the base
    tier for decay and the P10/P11 cadence inputs.

    Semantics per the reference:
    - consecutive failures reset on any success; ≥3 consecutive failures →
      30 min pause; otherwise exponential backoff 60·2^(n−1)s capped 1 h
      (work_queue.py:400-434; crawler/__init__.py:1097-1142);
    - P8: challenge → tier+3, failures → tier+1, cap 10; one-tier decay
      toward base after SENSITIVITY_DECAY_WAVES quiet waves
      (bot_sensitivity_manager.py:116-122, decay_sensitivity :539+);
    - P10: consecutive failures ≥ cadence-adaptive threshold → source pause
      for a day with paused_reason (source_processing.py:301-335);
    - P11: a failed feed fetch (no success that wave) opens a retry window
      clamp(2×cadence, 2..7 d) during which the host's feed URLs are not
      rescheduled (discovery.py:1934-1949).
    """
    has_challenge = "challenge" in wave_results.columns
    has_feed = "is_feed" in wave_results.columns
    ch = F.col("challenge") if has_challenge else F.lit(False)
    fe = F.col("is_feed") if has_feed else F.lit(False)
    sr = F.col("is_source") if "is_source" in wave_results.columns else F.lit(False)
    per_host = wave_results.groupBy("host").agg(
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("_succ"),
        F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("_fail"),
        F.sum(F.when(ch, 1).otherwise(0)).alias("_captcha"),
        F.sum(F.when(fe & F.col("ok"), 1).otherwise(0)).alias("_feed_ok"),
        F.sum(F.when(fe & ~F.col("ok"), 1).otherwise(0)).alias("_feed_fail"),
        F.sum(F.when(sr, 1).otherwise(0)).alias("_src_evt"),
    )
    state_cols = [f.split(" ")[0] for f in HOST_STATE_SCHEMA.split(", ")]
    if host_state is None:
        merged = per_host.select(
            "host",
            F.lit(0).alias("consecutive_failures"),
            F.lit(None).cast("double").alias("backoff_until"),
            F.lit(0).alias("last_wave"),
            F.lit(0).cast("long").alias("fetched_total"),
            F.lit(None).cast("int").alias("bot_sensitivity"),
            F.lit(None).cast("int").alias("sens_event_wave"),
            F.lit(None).cast("string").alias("paused_reason"),
            F.lit(None).cast("double").alias("feed_retry_until"),
            F.lit(None).cast("double").alias("source_next_due"),
            "_succ", "_fail", "_captcha", "_feed_ok", "_feed_fail", "_src_evt",
        )
    else:
        hs = host_state
        # schema evolution: older state tables lack the P8/P10/P11/P1 columns
        for name, typ in (
            ("bot_sensitivity", "int"), ("sens_event_wave", "int"),
            ("paused_reason", "string"), ("feed_retry_until", "double"),
            ("source_next_due", "double"),
        ):
            if name not in hs.columns:
                hs = hs.withColumn(name, F.lit(None).cast(typ))
        merged = hs.select(*state_cols).join(per_host, "host", "full").fillna(
            _STATE_DEFAULTS
        )
    if host_dim is not None:
        dim = host_dim.select(
            F.col("host").alias("_d_host"),
            F.col("bot_sensitivity").alias("_base_sens"),
            *(
                [F.col("cadence_days").alias("_cadence")]
                if "cadence_days" in host_dim.columns
                else [F.lit(FREQ_DEFAULT_DAYS).alias("_cadence")]
            ),
        )
        merged = merged.join(
            F.broadcast(dim), merged["host"] == dim["_d_host"], "left"
        ).drop("_d_host")
    else:
        merged = merged.withColumn("_base_sens", F.lit(None).cast("int"))
        merged = merged.withColumn("_cadence", F.lit(FREQ_DEFAULT_DAYS))

    base_sens = F.coalesce(F.col("_base_sens"), F.lit(5))
    cur_sens = F.coalesce(F.col("bot_sensitivity"), base_sens)
    had_event = (F.col("_captcha") > 0) | (F.col("_fail") > 0)
    quiet_for = F.lit(wave_idx) - F.coalesce(F.col("sens_event_wave"), F.lit(wave_idx))
    new_sens = (
        F.when(
            F.col("_captcha") > 0,
            F.least(cur_sens + SENSITIVITY_CAPTCHA_DELTA, F.lit(SENSITIVITY_MAX)),
        )
        .when(
            F.col("_fail") > 0,
            F.least(cur_sens + SENSITIVITY_FAILURE_DELTA, F.lit(SENSITIVITY_MAX)),
        )
        .when(
            quiet_for >= SENSITIVITY_DECAY_WAVES,
            F.greatest(cur_sens - 1, base_sens),
        )
        .otherwise(cur_sens)
        .cast("int")
    )
    new_event_wave = (
        F.when(had_event, F.lit(wave_idx))
        .when(quiet_for >= SENSITIVITY_DECAY_WAVES, F.lit(wave_idx))
        .otherwise(F.col("sens_event_wave"))
        .cast("int")
    )

    new_consec = (
        F.when(F.col("_succ") > 0, F.lit(0))
        .otherwise(F.col("consecutive_failures") + F.col("_fail"))
        .cast("int")
    )
    pause_thresh = pause_threshold_expr(F.col("_cadence"))
    paused = new_consec >= pause_thresh
    # A host with ZERO events this wave (full-outer row: _succ=0 AND _fail=0 —
    # e.g. it sat the wave out in backoff) keeps its existing backoff_until /
    # paused_reason untouched: recomputing them from the current wave_ts would
    # re-fire the pause every wave and the backoff would never expire
    # (ADVICE r2 high; mirrors simulator.py, which only updates evented hosts).
    no_event = (F.col("_succ") == 0) & (F.col("_fail") == 0)
    backoff = F.when(no_event, F.col("backoff_until")).otherwise(
        F.when(paused, F.lit(wave_ts) + F.lit(SOURCE_PAUSE_S))
        .when(new_consec >= FAILURE_PAUSE_AFTER, F.lit(wave_ts + FAILURE_PAUSE_S))
        .when(
            new_consec > 0,
            F.lit(wave_ts)
            + F.least(
                F.lit(BACKOFF_BASE_S) * F.pow(F.lit(2.0), new_consec - 1),
                F.lit(BACKOFF_CAP_S),
            ),
        )
        .otherwise(F.lit(None).cast("double"))
    )
    paused_reason = F.when(no_event, F.col("paused_reason")).otherwise(
        F.when(paused, F.lit("persistent_failures")).otherwise(
            F.lit(None).cast("string")
        )
    )
    feed_retry = (
        F.when(F.col("_feed_ok") > 0, F.lit(None).cast("double"))
        .when(
            F.col("_feed_fail") > 0,
            F.lit(wave_ts) + feed_retry_window_s(F.col("_cadence")),
        )
        .otherwise(F.col("feed_retry_until"))
    )
    # P1 cadence clock: any wave that touched the host's source URLs
    # (feed/homepage — success OR failure counts as an attempt, reference
    # update_last_processed, src/crawler/scheduling.py:139-162) re-arms
    # source_next_due = wave_ts + cadence_days·86400; otherwise preserved.
    src_due = (
        F.when(
            F.col("_src_evt") > 0,
            F.lit(wave_ts) + F.col("_cadence") * F.lit(86400.0),
        )
        .otherwise(F.col("source_next_due"))
        .cast("double")
    )
    return merged.select(
        "host",
        new_consec.alias("consecutive_failures"),
        backoff.alias("backoff_until"),
        F.lit(wave_idx).alias("last_wave"),
        (F.col("fetched_total") + F.col("_succ")).cast("long").alias("fetched_total"),
        new_sens.alias("bot_sensitivity"),
        new_event_wave.alias("sens_event_wave"),
        paused_reason.alias("paused_reason"),
        feed_retry.alias("feed_retry_until"),
        src_due.alias("source_next_due"),
    )


def quality_yield_priority(
    frontier: DataFrame,
    articles: DataFrame,
    quality_pass: Column,
    host_col: str = "host",
    neutral_bp: int = 5000,
) -> DataFrame:
    """Focused-crawl re-prioritization (Chakrabarti et al. 1999's focused
    crawling, restated as one join): re-rank pending frontier URLs by how
    much TRAINING-USABLE text their host has historically yielded —
    curation feeding back into the crawl.

    Per host, ``yield_bp = passed · 10000 div fetched`` (basis points of
    already-extracted articles satisfying ``quality_pass``); hosts with
    no fetch history get ``neutral_bp`` so exploitation never starves
    exploration of unseen hosts.  The combined rank is the integer

        priority2 = priority · 100000 + yield_bp

    — base priority (feeds-first etc.) still dominates, quality yield
    breaks ties inside a band, url_hash remains the final deterministic
    tie-break.  All-integer arithmetic: identical ordering on any engine
    or partitioning.

    This is deliberately NOT wired into ``build_wave``: the engine's
    crawl order is a pure function of the URL for reference parity — this
    operator is the opt-in focused-crawl alternative frontier ordering.
    Plan: one aggregation over articles (host-keyed, map-side
    combinable) broadcast into the frontier scan."""
    stats = articles.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("fetched"),
        F.sum(F.when(quality_pass, 1).otherwise(0)).alias("passed"),
    )
    joined = frontier.join(F.broadcast(stats), host_col, "left")
    yield_bp = F.when(
        F.col("fetched").isNull(), F.lit(neutral_bp)
    ).otherwise(F.expr("passed * 10000 div fetched").cast("long"))
    return (
        # yield first: the null-history guard reads the PRE-coalesce
        # fetched (coalescing to 0 first would turn the guard's otherwise
        # branch into an ANSI divide-by-zero)
        joined.withColumn("yield_bp", yield_bp)
        .withColumn("fetched", F.coalesce("fetched", F.lit(0)))
        .withColumn("passed", F.coalesce("passed", F.lit(0)))
        .withColumn(
            "priority2",
            F.col("priority").cast("long") * F.lit(100000)
            + F.col("yield_bp"),
        )
    )
