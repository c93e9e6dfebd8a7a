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
        assert n_cal == 0   # guarded: template over cap never admitted
    # story pages are unaffected either way
    arts = t.articles.read().where(F.col("url").contains("/story-"))
    assert arts.count() == 3
