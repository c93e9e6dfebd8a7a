"""North-rule correctness gate: the distributed engine must reproduce the
sequential reference-faithful simulator EXACTLY — URL-seen set, crawl order,
and per-URL extracted text (byte-identical via sha256) + status — under the
same seed list and politeness budget."""

from __future__ import annotations

import hashlib
import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from mizzounewscrawler_spark.crawl import CrawlConfig, open_tables, run_crawl
from mizzounewscrawler_spark.simulator import simulate_crawl

WAVES = 6


@pytest.fixture(scope="module")
def crawl_outputs(spark, web, web_spark):
    pages, seeds, robots = web_spark
    out_dir = tempfile.mkdtemp(prefix="crawl_parity_")
    cfg = CrawlConfig(max_waves=WAVES, use_bloom=True)
    stats = run_crawl(spark, pages, seeds, robots, out_dir, cfg)
    sim = simulate_crawl(web.pages, web.seeds, web.robots, max_waves=WAVES)
    yield out_dir, stats, sim
    shutil.rmtree(out_dir, ignore_errors=True)


def test_url_seen_set_parity(spark, crawl_outputs):
    out_dir, _, sim = crawl_outputs
    t = open_tables(spark, out_dir)
    engine_seen = {r["url_surt"] for r in t.url_seen.read().collect()}
    assert engine_seen == sim.seen


def test_crawl_order_parity(spark, crawl_outputs):
    out_dir, _, sim = crawl_outputs
    t = open_tables(spark, out_dir)
    engine_order = [
        (r["wave"], r["seq"], r["url_surt"])
        for r in t.order_log.read().orderBy("wave", "seq").collect()
    ]
    assert engine_order == sim.order


def test_articles_byte_identical_text_and_status(spark, crawl_outputs):
    out_dir, _, sim = crawl_outputs
    t = open_tables(spark, out_dir)
    engine = {
        r["url"]: (r["status"], r["content_hash"])
        for r in t.articles.read().collect()
    }
    assert engine == sim.articles


def test_text_matches_golden_pages_column(spark, crawl_outputs, web):
    """input_hint invariant: extracted text byte-identical to the golden
    ``text`` column of the pages table, per url (keyed canonically — a
    frontier row fetched via a tracking-param variant resolves to the same
    stored resource)."""
    from mizzounewscrawler_spark.functions.urls import surt

    out_dir, _, _ = crawl_outputs
    t = open_tables(spark, out_dir)
    arts = {
        r["url"]: r["content_hash"]
        for r in t.articles.read().where(F.col("status") == "extracted").collect()
    }
    golden = {surt(u): txt for u, txt in zip(web.pages["url"], web.pages["text"])}
    # fixture contract: the page store is canonical-unique per surt
    assert len(golden) == len(web.pages)
    assert arts, "no extracted articles?"
    for url, chash in arts.items():
        want = hashlib.sha256(golden[surt(url)].encode("utf-8")).hexdigest()
        assert chash == want, url


def test_robots_disallowed_never_fetched_but_seen(spark, crawl_outputs, web):
    out_dir, _, sim = crawl_outputs
    t = open_tables(spark, out_dir)
    fetched = {r["url"] for r in t.articles.read().collect()}
    private = [u for u in web.pages["url"] if "/private/" in u]
    assert private, "fixture should contain private pages"
    robots_hosts = set(web.robots[web.robots["disallow"].map(len) > 0]["host"])
    for u in private:
        host = u.split("//www.")[1].split("/")[0]
        if host in robots_hosts:
            assert u not in fetched, f"robots-disallowed URL fetched: {u}"
    # and the crawl actually did substantial work
    assert len(fetched) > 50


def test_recrawl_cadence_parity(spark, web, web_spark):
    """P1 perpetual-recrawl regime: sources (feeds + homepages) stay in the
    frontier and are re-fetched exactly when their cadence elapses on the
    virtual clock — engine order/seen/articles match the simulator under
    6-hour waves and the fixture's multi-cadence hosts (daily hosts re-fetch
    every wave, weekly+ sit out), and a daily feed really is fetched again."""
    pages, seeds, robots = web_spark
    out_dir = tempfile.mkdtemp(prefix="crawl_recrawl_")
    try:
        waves, dur = 6, 21600.0  # 6-hour waves: daily cadence (0.25 d) = 1 wave
        cfg = CrawlConfig(
            max_waves=waves, use_bloom=True, recrawl_sources=True,
            wave_duration=dur,
        )
        run_crawl(spark, pages, seeds, robots, out_dir, cfg)
        sim = simulate_crawl(
            web.pages, web.seeds, web.robots, max_waves=waves,
            wave_duration=dur, recrawl_sources=True,
        )
        t = open_tables(spark, out_dir)
        engine_order = [
            (r["wave"], r["seq"], r["url_surt"])
            for r in t.order_log.read().orderBy("wave", "seq").collect()
        ]
        assert engine_order == sim.order
        engine_seen = {r["url_surt"] for r in t.url_seen.read().collect()}
        assert engine_seen == sim.seen
        engine_arts = {
            r["url"]: (r["status"], r["content_hash"])
            for r in t.articles.read().collect()
        }
        assert engine_arts == sim.articles
        # a daily host's feed is fetched in more than one wave (recrawl!),
        # and never twice before its cadence elapsed
        feed_waves: dict[str, list[int]] = {}
        for w, _, s in engine_order:
            if s.endswith(")/feed"):
                feed_waves.setdefault(s, []).append(w)
        daily = {h for h, f in zip(web.seeds["host"], web.seeds["frequency"])
                 if f == "daily"}
        daily_feeds = [s for s in feed_waves
                       if ".".join(reversed(s.split(")", 1)[0].split(","))) in daily]
        assert daily_feeds and any(len(feed_waves[s]) > 1 for s in daily_feeds)
        for s, ws in feed_waves.items():
            host = ".".join(reversed(s.split(")", 1)[0].split(",")))
            cad_waves = {"daily": 1, "weekly": 14, "biweekly": 56,
                         "monthly": 120}.get(
                dict(zip(web.seeds["host"], web.seeds["frequency"]))[host], 28
            )
            for a, b in zip(ws, ws[1:]):
                assert b - a >= cad_waves, (s, ws)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_counters_in_snapshot_summaries(spark, crawl_outputs):
    out_dir, stats, _ = crawl_outputs
    t = open_tables(spark, out_dir)
    snaps = t.frontier.snapshots()
    waves = [s.summary for s in snaps if s.summary.get("wave", -1) >= 0]
    assert waves, "no wave commits"
    for s in waves:
        for key in ("frontier", "scheduled", "fetched", "discovered", "deduped"):
            assert key in s, s
    assert stats["waves_run"] >= 3
