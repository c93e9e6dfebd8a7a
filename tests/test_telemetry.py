"""A9 telemetry depth: per-host error rollups + method-effectiveness
pruning (reference comprehensive_telemetry/get_error_summary and
telemetry.get_effective_discovery_methods / _prioritize_last_success)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mizzounewscrawler_spark.plans.telemetry import (  # noqa: E402
    DEFAULT_METHODS,
    effective_methods_per_host,
    host_error_summary,
    method_effectiveness,
)


def _arts(spark, rows):
    return spark.createDataFrame(
        rows, "host string, method string, status string, wave int"
    )


def test_host_error_summary_classes(spark):
    arts = _arts(spark, [
        ("a.test", "rss_feed", "extracted", 0),
        ("a.test", "rss_feed", "wire", 1),
        ("a.test", "rss_feed", "paywall", 2),
        ("a.test", "rss_feed", "proxy_blocked", 3),
        ("a.test", "rss_feed", "failed", 4),
        ("b.test", "rss_feed", "feed", 0),
    ])
    got = {
        (r["host"], r["error_class"]): (r["n"], r["last_wave"])
        for r in host_error_summary(arts).collect()
    }
    assert got[("a.test", "ok")] == (2, 1)
    assert got[("a.test", "thin")] == (1, 2)
    assert got[("a.test", "challenge")] == (1, 3)
    assert got[("a.test", "error")] == (1, 4)
    assert got[("b.test", "ok")] == (1, 0)


def test_method_effectiveness_pruning_rule(spark):
    arts = _arts(spark, [
        # rss: 3 attempts, 3 ok → effective
        *[("a.test", "rss_feed", "extracted", w) for w in range(3)],
        # newspaper4k: 2 attempts, 1 ok (50%) → NOT effective (rule is >50)
        ("a.test", "newspaper4k", "extracted", 0),
        ("a.test", "newspaper4k", "failed", 1),
        # storysniffer: 1 attempt, 1 ok → NOT effective (attempts < 2)
        ("a.test", "storysniffer", "extracted", 0),
    ])
    got = {r["method"]: r for r in method_effectiveness(arts).collect()}
    assert got["rss_feed"]["effective"] is True
    assert got["rss_feed"]["success_rate"] == 100.0
    assert got["newspaper4k"]["effective"] is False
    assert got["storysniffer"]["effective"] is False


def test_effective_methods_order_fallback_and_last_success(spark):
    arts = _arts(spark, [
        # host a: two effective methods; newspaper4k has the higher rate
        *[("a.test", "newspaper4k", "extracted", w) for w in range(4)],
        ("a.test", "rss_feed", "extracted", 0),
        ("a.test", "rss_feed", "extracted", 5),  # ...but rss succeeded LAST
        ("a.test", "rss_feed", "failed", 1),
        # host b: nothing effective → all-methods fallback
        ("b.test", "rss_feed", "failed", 0),
        ("b.test", "newspaper4k", "failed", 1),
    ])
    got = {r["host"]: r for r in effective_methods_per_host(arts).collect()}
    # a: rss_feed (66%) is ranked below newspaper4k (100%) on rate, but the
    # last-success prioritization moves rss_feed to the front
    assert got["a.test"]["last_success"] == "rss_feed"
    assert got["a.test"]["methods"] == ["rss_feed", "newspaper4k"]
    # b: fallback to all methods, no last success
    assert got["b.test"]["methods"] == list(DEFAULT_METHODS)
    assert got["b.test"]["last_success"] is None


def test_publisher_stats_rollup(spark):
    from mizzounewscrawler_spark.plans.telemetry import publisher_stats

    arts = spark.createDataFrame(
        [
            ("pub-a", "a.test", "rss_feed", "extracted", 100.0),
            ("pub-a", "a.test", "rss_feed", "failed", 200.0),
            ("pub-a", "a.test", "newspaper4k", "wire", 40.0),
            ("pub-b", "b.test", "rss_feed", "extracted", 10.0),
        ],
        "publisher string, host string, method string, status string, duration_ms double",
    )
    rows = {
        (r["publisher"], r["most_common_method"]): r
        for r in publisher_stats(arts).collect()
    }
    top = rows[("pub-a", "rss_feed")]
    assert top["total_attempts"] == 2 and top["successful"] == 1
    assert top["avg_duration_ms"] == 150.0
    # attempts-descending order (reference ORDER BY total_attempts DESC)
    ordered = publisher_stats(arts).collect()
    assert ordered[0]["total_attempts"] == 2


def test_fetch_events_stream_feeds_rollups(spark, web_spark):
    """VERDICT r3 missing #2: the record-level fetch_events table is written
    per wave, carries per-operation events (fetch/discovery/challenge), and
    the A9 rollups recomputed from its fetch slice match the
    article-derived ones exactly."""
    import tempfile

    from pyspark.sql import functions as F

    from mizzounewscrawler_spark.crawl import CrawlConfig, open_tables, run_crawl
    from mizzounewscrawler_spark.plans.telemetry import (
        host_error_summary,
        method_effectiveness,
    )

    pages, seeds, robots = web_spark
    out = tempfile.mkdtemp(prefix="crawl_events_")
    cfg = CrawlConfig(max_waves=3, bloom_capacity=10000, with_fetch_events=True)
    run_crawl(spark, pages, seeds, robots, out, cfg)
    t = open_tables(spark, out)
    events = t.fetch_events.read()
    articles = t.articles.read()

    # one fetch event per article row (scheduled URL), incl. failures
    fetch = events.where(F.col("operation") == "fetch")
    assert fetch.count() == articles.count()
    # discovery outcomes exist and carry link counts
    disc = events.where(F.col("operation") == "discovery")
    assert disc.count() > 0
    assert disc.where(F.col("status") == "links_found").where(
        F.col("n_links") > 0
    ).count() > 0

    def rows(df):
        cols = sorted(df.columns)
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    ev_view = fetch.select("host", "status", "wave", "method")
    assert rows(host_error_summary(ev_view)) == rows(host_error_summary(articles))
    assert rows(method_effectiveness(ev_view)) == rows(
        method_effectiveness(articles)
    )
