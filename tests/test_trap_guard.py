"""Crawler-trap guard in the wave loop (CrawlConfig.trap_guard_max)."""

from __future__ import annotations

import datetime as dt
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mizzounewscrawler_spark.crawl import CrawlConfig, open_tables, run_crawl

HOST = "trap.news.test"
BASE = f"https://www.{HOST}"


def _web(spark):
    ts = dt.datetime(2024, 1, 15, 12, 0, 0)
    cal = [f"{BASE}/calendar/2024/{i}?day={i}" for i in range(30)]
    stories = [f"{BASE}/2024/01/0{i + 1}/story-{i}.html" for i in range(3)]
    links = "".join(f'<a href="{u}">x</a>' for u in cal + stories)
    body = " ".join(["word"] * 200)
    rows = [(f"{BASE}/", ts, f"<html><body>{links}</body></html>".encode(),
             "", "en")]
    for u in cal:
        # each calendar page links to yet another calendar day — the trap
        nxt = f'<a href="{BASE}/calendar/2024/{hash(u) % 1000 + 100}">n</a>'
        rows.append((u, ts, f"<html><body>{nxt}</body></html>".encode(),
                     "", "en"))
    for u in stories:
        rows.append((
            u, ts,
            f"<html><body><h1>T</h1><p>{body}</p></body></html>".encode(),
            body, "en",
        ))
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string,"
        " lang string",
    )
    seeds = spark.createDataFrame(
        pd.DataFrame([{
            "source_id": f"src-{HOST}", "host": HOST, "name": "Trap Gazette",
            "frequency": "daily", "bot_sensitivity": 1, "feed_urls": [],
            "city": "X", "county": "Y", "status": "active",
        }])
    )
    robots = spark.createDataFrame(
        pd.DataFrame([{"host": HOST, "user_agent": "*", "disallow": [],
                       "crawl_delay": 0.0}])
    )
    return pages, seeds, robots


@pytest.mark.parametrize("guard,expect_trapped", [(0, True), (10, False)])
def test_trap_guard_blocks_calendar_explosion(spark, guard, expect_trapped):
    pages, seeds, robots = _web(spark)
    out = tempfile.mkdtemp(prefix="trapguard_")
    cfg = CrawlConfig(max_waves=3, max_per_host=50, trap_guard_max=guard)
    run_crawl(spark, pages, seeds, robots, out, cfg)
    t = open_tables(spark, out)
    seen = t.url_seen.read().where(F.col("url_surt").contains("/calendar/"))
    n_cal = seen.count()
    if expect_trapped:
        assert n_cal >= 30  # unguarded: the whole calendar family admitted
    else:
        # guarded, PARTIAL admission: the 30-URL /calendar/N/N?Q burst
        # admits exactly cap URLs (not zero — a template arriving only in
        # over-cap bursts must still reach its lifetime cap); the next-day
        # links those pages discover form the separate /calendar/N/N
        # template, itself capped.  Unbounded growth is what's blocked.
        n_q = t.url_seen.read().where(
            F.col("url_surt").contains("day=")
        ).count()
        assert n_q == 10
        assert n_cal <= 20
    # story pages are unaffected either way
    arts = t.articles.read().where(F.col("url").contains("/story-"))
    assert arts.count() == 3


def test_trap_guard_cap_is_cumulative_across_waves(spark):
    """The counts persist in the trap_counts lake table: a template whose
    waves are each under the cap still trips it once its ALL-TIME admitted
    URLs plus the wave's candidates exceed the cap — fetched trap URLs
    leaving the pending frontier no longer un-trap their template."""
    ts = dt.datetime(2024, 1, 15, 12, 0, 0)
    first = [f"{BASE}/archive/2024/{i}" for i in range(8)]
    nxt = [f"{BASE}/archive/2024/{i + 100}" for i in range(8)]
    links = "".join(f'<a href="{u}">x</a>' for u in first)
    rows = [(f"{BASE}/", ts, f"<html><body>{links}</body></html>".encode(),
             "", "en")]
    for u, n in zip(first, nxt):
        # every wave-1 fetch discovers one MORE distinct archive page
        rows.append((
            u, ts,
            f'<html><body><a href="{n}">n</a></body></html>'.encode(),
            "", "en",
        ))
    for u in nxt:
        rows.append((u, ts, b"<html><body>end</body></html>", "", "en"))
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string,"
        " lang string",
    )
    seeds = spark.createDataFrame(
        pd.DataFrame([{
            "source_id": f"src-{HOST}", "host": HOST, "name": "Trap Gazette",
            "frequency": "daily", "bot_sensitivity": 1, "feed_urls": [],
            "city": "X", "county": "Y", "status": "active",
        }])
    )
    robots = spark.createDataFrame(
        pd.DataFrame([{"host": HOST, "user_agent": "*", "disallow": [],
                       "crawl_delay": 0.0}])
    )
    out = tempfile.mkdtemp(prefix="trapguard_cum_")
    cfg = CrawlConfig(max_waves=4, max_per_host=50, trap_guard_max=10)
    run_crawl(spark, pages, seeds, robots, out, cfg)
    t = open_tables(spark, out)
    n_arch = t.url_seen.read().where(
        F.col("url_surt").contains("/archive/")
    ).count()
    # wave 0 admits the 8 under-cap pages; wave 1's 8 fresh pages would
    # push the template's lifetime total to 16 > 10, so partial admission
    # takes exactly cap - prior = 2 of them and blocks the rest — without
    # the persisted counts the whole second batch would sail through (the
    # first 8 left the pending frontier when fetched)
    assert n_arch == 10
    assert t.trap_counts.exists()


def test_trap_guard_rediscovered_urls_never_double_count(spark):
    """Nav links re-emit already-admitted URLs every wave.  The guard
    mines POST-dedup new rows, so rediscoveries of counted URLs add
    nothing to the lifetime total — a template must not freeze below the
    cap just because its admitted URLs keep being rediscovered
    (pre-dedup candidate mining double-counted them: 12 admitted + 12
    rediscovered = 24 > 20 would wrongly block 2 genuinely new URLs)."""
    ts = dt.datetime(2024, 1, 15, 12, 0, 0)
    arch = [f"{BASE}/archive/2024/{i}" for i in range(12)]
    new2 = [f"{BASE}/archive/2024/{i + 500}" for i in range(2)]
    nav = "".join(f'<a href="{u}">x</a>' for u in arch)
    rows = [(f"{BASE}/", ts, f"<html><body>{nav}</body></html>".encode(),
             "", "en")]
    for j, u in enumerate(arch):
        # every archive page re-links the whole archive family (the nav),
        # and the first one also links the two genuinely new pages
        extra = "".join(f'<a href="{n}">n</a>' for n in new2) if j == 0 else ""
        rows.append((
            u, ts,
            f"<html><body>{nav}{extra}</body></html>".encode(), "", "en",
        ))
    for u in new2:
        rows.append((u, ts, b"<html><body>end</body></html>", "", "en"))
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string,"
        " lang string",
    )
    seeds = spark.createDataFrame(
        pd.DataFrame([{
            "source_id": f"src-{HOST}", "host": HOST, "name": "Trap Gazette",
            "frequency": "daily", "bot_sensitivity": 1, "feed_urls": [],
            "city": "X", "county": "Y", "status": "active",
        }])
    )
    robots = spark.createDataFrame(
        pd.DataFrame([{"host": HOST, "user_agent": "*", "disallow": [],
                       "crawl_delay": 0.0}])
    )
    out = tempfile.mkdtemp(prefix="trapguard_redisc_")
    cfg = CrawlConfig(max_waves=4, max_per_host=50, trap_guard_max=20)
    run_crawl(spark, pages, seeds, robots, out, cfg)
    t = open_tables(spark, out)
    n_arch = t.url_seen.read().where(
        F.col("url_surt").contains("/archive/")
    ).count()
    assert n_arch == 14  # 12 + the 2 new ones; nothing wrongly blocked
