"""A9 telemetry depth: per-host error-class rollups and discovery-method
effectiveness feeding the method-pruning behavior.

Reference semantics being re-expressed:
- http_error_summary per (host, error class), count-descending
  (/root/reference/src/utils/comprehensive_telemetry.py:829-853);
- discovery_method_effectiveness per (source, method) with the pruning
  rule ``success_rate > 50 AND articles_found > 0 AND attempts >= 2``,
  ordered by (success_rate DESC, articles_found DESC), falling back to ALL
  methods when nothing qualifies
  (/root/reference/src/utils/telemetry.py:1841-1885);
- last-successful-method prioritization — the most recently successful
  method moves to the front of the attempt order
  (/root/reference/src/crawler/source_processing.py:369-445).

The reference computes these with per-source SQLite queries inside the
crawl loop; here they are plain aggregations over the articles lake table
— partial-agg friendly groupBys on (host, …) keys, no windows over skewed
partitions, array ordering done with ``sort_array`` on packed structs so
everything stays whole-stage-codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# engine fetch_status → reference error/status class
#   ok:        the fetch produced usable signal (extracted/wire/feed)
#   thin:      content too short / paywalled (reference thin-content gate)
#   challenge: bot-challenge page (the P8 captcha signal)
#   error:     fetch failed outright
OK_STATUSES = ("extracted", "wire", "feed")
DEFAULT_METHODS = ("rss_feed", "newspaper4k", "storysniffer")


def fetch_events_from_results(
    results: DataFrame, wave: int, wave_ts: float
) -> DataFrame:
    """Record-level per-operation telemetry events from one wave's fetch
    results — the reference's comprehensive-telemetry record shape
    (operation / outcome / status per fetch,
    /root/reference/src/utils/comprehensive_telemetry.py:335; tables at
    src/utils/telemetry.py:43-63), which the engine previously only had in
    rolled-up form (VERDICT r3 missing #2).

    Per scheduled URL this emits:
    - one ``fetch`` event (status = the fetch-status cascade outcome, so
      scheduled-but-failed URLs that never become useful article rows are
      individually auditable),
    - one ``discovery`` event for fetched pages (links_found/no_links with
      the link count),
    - one ``challenge`` event when a bot-challenge page was served.

    Built as one select + explode(filter(array(structs))) — pure JVM
    expressions riding the results scan the wave already pays; no second
    pass over html.  The A9 rollups recompute exactly from the ``fetch``
    slice (tested in tests/test_telemetry.py)."""
    nstr = F.lit(None).cast("string")
    nint = F.lit(None).cast("int")
    fetch_ev = F.struct(
        F.lit("fetch").alias("operation"),
        F.col("fetch_status").alias("status"),
        F.col("method").alias("method"),
        nint.alias("n_links"),
    )
    disc_ev = F.when(
        F.col("found"),
        F.struct(
            F.lit("discovery").alias("operation"),
            F.when(F.size("links") > 0, F.lit("links_found"))
            .otherwise(F.lit("no_links"))
            .alias("status"),
            nstr.alias("method"),
            F.size("links").alias("n_links"),
        ),
    )
    chal_ev = F.when(
        F.col("is_challenge"),
        F.struct(
            F.lit("challenge").alias("operation"),
            F.lit("challenge_page").alias("status"),
            nstr.alias("method"),
            nint.alias("n_links"),
        ),
    )
    events = F.filter(
        F.array(fetch_ev, disc_ev, chal_ev), lambda e: e.isNotNull()
    )
    return results.select(
        F.lit(wave).alias("wave"),
        F.lit(wave_ts).alias("wave_ts"),
        "url_hash",
        "host",
        F.explode(events).alias("e"),
    ).select("wave", "wave_ts", "url_hash", "host", "e.*")


def error_class_expr(status: Column) -> Column:
    return (
        F.when(status.isin(*OK_STATUSES), F.lit("ok"))
        .when(status == "paywall", F.lit("thin"))
        .when(status == "proxy_blocked", F.lit("challenge"))
        .otherwise(F.lit("error"))
    )


def host_error_summary(
    articles: DataFrame,
    host_col: str = "host",
    status_col: str = "status",
    wave_col: str = "wave",
) -> DataFrame:
    """Per-(host, error_class) rollup: count + last wave seen — the
    http_error_summary shape (comprehensive_telemetry.py:829-853).  A
    groupBy on a (host, class) key: map-side partial aggregation absorbs
    hot hosts, no per-key window."""
    has_wave = wave_col in articles.columns
    aggs = [F.count(F.lit(1)).alias("n")]
    if has_wave:
        aggs.append(F.max(F.col(wave_col)).alias("last_wave"))
    return (
        articles.select(
            F.col(host_col).alias("host"),
            error_class_expr(F.col(status_col)).alias("error_class"),
            *([F.col(wave_col)] if has_wave else []),
        )
        .groupBy("host", "error_class")
        .agg(*aggs)
    )


def method_effectiveness(
    articles: DataFrame,
    host_col: str = "host",
    method_col: str = "method",
    status_col: str = "status",
) -> DataFrame:
    """Per-(host, method): attempts, articles found, success-rate pct and
    the reference's pruning verdict (telemetry.py:1863-1869):
    effective ⇔ success_rate > 50 AND articles_found > 0 AND attempts ≥ 2.
    """
    ok = F.col(status_col).isin(*OK_STATUSES)
    out = (
        articles.where(F.col(method_col).isNotNull())
        .groupBy(
            F.col(host_col).alias("host"), F.col(method_col).alias("method")
        )
        .agg(
            F.count(F.lit(1)).alias("attempts"),
            F.sum(F.when(ok, 1).otherwise(0)).alias("articles_found"),
        )
        .withColumn(
            "success_rate",
            F.round(F.col("articles_found") * 100.0 / F.col("attempts"), 2),
        )
    )
    return out.withColumn(
        "effective",
        (F.col("success_rate") > 50)
        & (F.col("articles_found") > 0)
        & (F.col("attempts") >= 2),
    )


def effective_methods_per_host(
    articles: DataFrame,
    host_col: str = "host",
    method_col: str = "method",
    status_col: str = "status",
    wave_col: str = "wave",
    all_methods: tuple[str, ...] = DEFAULT_METHODS,
) -> DataFrame:
    """The method-pruning feed: per host, the ordered list of methods worth
    attempting next.

    Order = (success_rate DESC, articles_found DESC) over the effective set
    (telemetry.py:1857-1859), with the host's last successful method moved
    to the front (_prioritize_last_success, source_processing.py:424-445);
    hosts with NO effective method fall back to ``all_methods``
    (telemetry.py:1880-1885's all-methods fallback).

    Ordering is done by packing sort keys into structs and ``sort_array``
    — one groupBy, no windows, array ops are codegen'd.
    """
    eff = method_effectiveness(
        articles, host_col=host_col, method_col=method_col,
        status_col=status_col,
    )
    ranked = (
        eff.where(F.col("effective"))
        .groupBy("host")
        .agg(
            F.transform(
                F.reverse(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("success_rate").alias("r"),
                                F.col("articles_found").alias("a"),
                                F.col("method").alias("m"),
                            )
                        )
                    )
                ),
                lambda s: s["m"],
            ).alias("methods")
        )
    )
    # last successful method per host = method of the max-(wave) ok row
    has_wave = wave_col in articles.columns
    ok = F.col(status_col).isin(*OK_STATUSES)
    last = (
        articles.where(ok & F.col(method_col).isNotNull())
        .groupBy(F.col(host_col).alias("host"))
        .agg(
            F.max_by(
                F.col(method_col),
                F.col(wave_col) if has_wave else F.lit(0),
            ).alias("last_success")
        )
    )
    hosts = articles.select(F.col(host_col).alias("host")).distinct()
    out = (
        hosts.join(ranked, "host", "left")
        .join(last, "host", "left")
        .withColumn(
            "methods",
            F.when(
                F.col("methods").isNull() | (F.size("methods") == 0),
                F.array(*[F.lit(m) for m in all_methods]),
            ).otherwise(F.col("methods")),
        )
    )
    # move last_success to the front when present in the list
    ls = F.col("last_success")
    return out.select(
        "host",
        F.when(
            ls.isNotNull() & F.array_contains(F.col("methods"), ls),
            F.concat(
                F.array(ls),
                F.filter(F.col("methods"), lambda m: m != ls),
            ),
        )
        .otherwise(F.col("methods"))
        .alias("methods"),
        "last_success",
    )


def publisher_stats(
    articles: DataFrame,
    publisher_col: str = "publisher",
    host_col: str = "host",
    method_col: str = "method",
    status_col: str = "status",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Per-(publisher, host, method) performance rollup — the reference's
    ``get_publisher_stats`` (comprehensive_telemetry.py:1281-1304):
    total attempts, successes, and average duration, attempts-descending.

    Plain groupBy on a uniform composite key: map-side partial aggregation
    (count/sum/avg all combine), no window, no skew hazard — the per-pub
    SQLite query becomes one shuffle that scales linearly with article
    volume."""
    ok = F.col(status_col).isin(*OK_STATUSES)
    return (
        articles.groupBy(
            F.col(publisher_col).alias("publisher"),
            F.col(host_col).alias("host"),
            F.col(method_col).alias("most_common_method"),
        )
        .agg(
            F.count(F.lit(1)).alias("total_attempts"),
            F.sum(F.when(ok, 1).otherwise(0)).alias("successful"),
            F.avg(F.col(duration_col)).alias("avg_duration_ms"),
        )
        .orderBy(
            F.col("total_attempts").desc(),
            "publisher",
            "host",
            "most_common_method",
        )
    )
