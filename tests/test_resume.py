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


def test_resume_detects_orphans_below_maintenance_commit(spark, web_spark):
    """ADVICE r4: a wave-less maintenance commit (requeue merge /
    out-of-band compaction) made BETWEEN the crash and the resume sits on
    top of the wave>=start_wave orphans; the orphan scan must look past
    it instead of concluding 'no orphans' and double-appending the
    replayed wave."""
    import glob
    import os

    from pyspark.sql import functions as F

    pages, seeds, robots = web_spark
    full_dir = tempfile.mkdtemp(prefix="crawl_full3_")
    part_dir = tempfile.mkdtemp(prefix="crawl_maint_")
    try:
        run_crawl(spark, pages, seeds, robots, full_dir, CrawlConfig(max_waves=4))
        run_crawl(spark, pages, seeds, robots, part_dir, CrawlConfig(max_waves=3))
        # crash: the wave-2 frontier checkpoint "never happened"
        snaps = sorted(glob.glob(f"{part_dir}/frontier/snapshots/v*.json"))
        os.remove(snaps[-1])
        # post-crash, pre-resume housekeeping: a content-preserving
        # compaction commit WITHOUT a wave key lands ABOVE url_seen's
        # wave-2 orphan append
        t = open_tables(spark, part_dir)
        t.url_seen.compact({"out_of_band": True})
        assert "wave" not in t.url_seen.current_snapshot().summary

        stats = run_crawl(spark, pages, seeds, robots, part_dir, CrawlConfig(max_waves=4))
        assert stats["start_wave"] == 2
        assert _collect(spark, full_dir) == _collect(spark, part_dir)
        seen = open_tables(spark, part_dir).url_seen.read()
        assert seen.count() == seen.select(F.col("url_hash")).distinct().count()
    finally:
        shutil.rmtree(full_dir, ignore_errors=True)
        shutil.rmtree(part_dir, ignore_errors=True)


def test_resume_survives_gc_pruned_history_with_rewrite_above_orphan(
    spark, web_spark
):
    """ADVICE r4 (medium): when snapshot GC pruned every pre-crash
    manifest AND a rewrite sits above an append orphan (compact_small ran
    in the crashed wave), no rollback commit is written and no snapshot
    carries wave <= start_wave-1 — resume must fall back to the current
    url_seen view (bounded one-wave duplicate rows) instead of crashing
    on seen=None."""
    import glob
    import os

    from pyspark.sql import functions as F

    pages, seeds, robots = web_spark
    full_dir = tempfile.mkdtemp(prefix="crawl_full4_")
    part_dir = tempfile.mkdtemp(prefix="crawl_gc_")
    try:
        run_crawl(spark, pages, seeds, robots, full_dir, CrawlConfig(max_waves=4))
        run_crawl(spark, pages, seeds, robots, part_dir, CrawlConfig(max_waves=3))
        snaps = sorted(glob.glob(f"{part_dir}/frontier/snapshots/v*.json"))
        os.remove(snaps[-1])
        t = open_tables(spark, part_dir)
        # the crashed wave's own compaction: a REWRITE stamped wave 2
        # above the wave-2 append orphan, then GC keeps only those two
        t.url_seen.compact({"wave": 2})
        t.url_seen.expire_snapshots(2)
        waves = [s.summary.get("wave", -1) for s in t.url_seen.snapshots()]
        assert all(w >= 2 for w in waves), waves  # no pre-crash restore point

        pre_resume = {
            r["url_surt"]
            for r in t.url_seen.read().select("url_surt").collect()
        }

        stats = run_crawl(spark, pages, seeds, robots, part_dir, CrawlConfig(max_waves=4))
        # the regression being pinned: the old code passed seen=None
        # downstream and died on AttributeError before running any wave
        assert stats["start_wave"] == 2
        assert stats["waves_run"] >= 1
        # bounded degradation, not data loss: every URL committed before
        # the resume is still in the seen set (the fallback read the
        # CURRENT view, orphans included; the crawl path may diverge from
        # the uninterrupted run because host_state also resumed from its
        # post-crash view — that divergence is the documented, bounded
        # cost of losing every pre-crash manifest to GC)
        t2 = open_tables(spark, part_dir)
        got = {
            r["url_surt"]
            for r in t2.url_seen.read().select("url_surt").collect()
        }
        assert pre_resume <= got
        # and the engine kept crawling: waves past the crash added work
        assert len(got) > len(pre_resume)
        arts = t2.articles.read()
        assert arts.where(F.col("wave") >= 2).count() > 0
    finally:
        shutil.rmtree(full_dir, ignore_errors=True)
        shutil.rmtree(part_dir, ignore_errors=True)
