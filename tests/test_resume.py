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
