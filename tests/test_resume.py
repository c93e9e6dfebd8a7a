"""Checkpoint/resume: a crawl killed after wave K resumes from the last
committed snapshot and ends bit-identical to an uninterrupted run — no URL
re-fetched, none re-seen (north rule)."""

from __future__ import annotations

import shutil
import tempfile

from mizzounewscrawler_spark.crawl import CrawlConfig, open_tables, run_crawl


def _collect(spark, out_dir):
    t = open_tables(spark, out_dir)
    arts = sorted(
        (r["url"], r["status"], r["content_hash"], r["wave"])
        for r in t.articles.read().collect()
    )
    seen = sorted(r["url_surt"] for r in t.url_seen.read().collect())
    order = sorted(
        (r["wave"], r["seq"], r["url_surt"]) for r in t.order_log.read().collect()
    )
    return arts, seen, order


def test_resume_equals_uninterrupted(spark, web_spark):
    pages, seeds, robots = web_spark
    full_dir = tempfile.mkdtemp(prefix="crawl_full_")
    part_dir = tempfile.mkdtemp(prefix="crawl_part_")
    try:
        run_crawl(spark, pages, seeds, robots, full_dir, CrawlConfig(max_waves=5))
        # "killed" run: stop after 2 waves, then resume to 5
        run_crawl(spark, pages, seeds, robots, part_dir, CrawlConfig(max_waves=2))
        stats = run_crawl(spark, pages, seeds, robots, part_dir, CrawlConfig(max_waves=5))
        assert stats["start_wave"] == 2, "resume must pick up after last commit"
        assert _collect(spark, full_dir) == _collect(spark, part_dir)
        # no URL fetched twice across the resumed run
        t = open_tables(spark, part_dir)
        arts = t.articles.read()
        assert arts.count() == arts.select("url").distinct().count()
    finally:
        shutil.rmtree(full_dir, ignore_errors=True)
        shutil.rmtree(part_dir, ignore_errors=True)


def test_resume_after_mid_wave_crash_rolls_back_orphans(spark, web_spark):
    """Crash WINDOW recovery: the side tables (articles/url_seen/…) commit
    before the frontier checkpoint; a kill in between leaves committed
    wave-w orphan snapshots.  Resume must roll them back before replaying
    the wave — otherwise every orphaned row double-appends."""
    import glob
    import os

    pages, seeds, robots = web_spark
    full_dir = tempfile.mkdtemp(prefix="crawl_full2_")
    part_dir = tempfile.mkdtemp(prefix="crawl_crash_")
    try:
        run_crawl(spark, pages, seeds, robots, full_dir, CrawlConfig(max_waves=4))
        run_crawl(spark, pages, seeds, robots, part_dir, CrawlConfig(max_waves=3))
        # simulate the crash: drop the frontier's LAST wave-bearing
        # manifest (the wave-2 checkpoint commit "never happened"), while
        # articles/url_seen/order_log keep their committed wave-2 orphans
        snaps = sorted(glob.glob(f"{part_dir}/frontier/snapshots/v*.json"))
        os.remove(snaps[-1])

        stats = run_crawl(spark, pages, seeds, robots, part_dir, CrawlConfig(max_waves=4))
        assert stats["start_wave"] == 2, "resume replays the crashed wave"
        assert _collect(spark, full_dir) == _collect(spark, part_dir)
        t = open_tables(spark, part_dir)
        arts = t.articles.read()
        assert arts.count() == arts.select("url").distinct().count()
        seen = t.url_seen.read()
        assert seen.count() == seen.select("url_hash").distinct().count()
    finally:
        shutil.rmtree(full_dir, ignore_errors=True)
        shutil.rmtree(part_dir, ignore_errors=True)
