"""Partition-aligned bucket-sweep crawling: engine/simulator parity under
the sweep, per-wave bucket discipline, and pruned-scan plan evidence.

The sweep is the 100 TB fetch design: each wave touches one url_hash bucket
so the page-store "fetch" scan partition-prunes to 1/H of the data instead
of streaming the whole store every wave."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from mizzounewscrawler_spark.crawl import CrawlConfig, open_tables, run_crawl
from mizzounewscrawler_spark.functions.urls import surt_expr, url_hash_expr
from mizzounewscrawler_spark.simulator import simulate_crawl

SWEEP = 4
WAVES = 10


@pytest.fixture(scope="module")
def sweep_outputs(spark, web, web_spark):
    pages, seeds, robots = web_spark
    # bucketed page store, exactly as the bench writes it
    bdir = tempfile.mkdtemp(prefix="sweep_pages_")
    pages.withColumn(
        "bucket",
        F.pmod(url_hash_expr(surt_expr(F.col("url"))), F.lit(SWEEP)).cast("int"),
    ).write.mode("overwrite").partitionBy("bucket").parquet(bdir)
    pages_b = spark.read.parquet(bdir)
    out_dir = tempfile.mkdtemp(prefix="sweep_crawl_")
    cfg = CrawlConfig(max_waves=WAVES, bucket_sweep=SWEEP)
    stats = run_crawl(spark, pages_b, seeds, robots, out_dir, cfg)
    sim = simulate_crawl(
        web.pages, web.seeds, web.robots, max_waves=WAVES, bucket_sweep=SWEEP
    )
    yield out_dir, stats, sim, pages_b
    shutil.rmtree(out_dir, ignore_errors=True)
    shutil.rmtree(bdir, ignore_errors=True)


def test_sweep_url_seen_and_order_parity(spark, sweep_outputs):
    out_dir, _, sim, _ = sweep_outputs
    t = open_tables(spark, out_dir)
    engine_seen = {r["url_surt"] for r in t.url_seen.read().collect()}
    assert engine_seen == sim.seen
    engine_order = [
        (r["wave"], r["seq"], r["url_surt"])
        for r in t.order_log.read().orderBy("wave", "seq").collect()
    ]
    assert engine_order == sim.order


def test_sweep_articles_parity(spark, sweep_outputs):
    out_dir, _, sim, _ = sweep_outputs
    t = open_tables(spark, out_dir)
    engine = {
        r["url"]: (r["status"], r["content_hash"])
        for r in t.articles.read().collect()
    }
    assert engine == sim.articles
    assert len(engine) > 30, "sweep crawl did too little work"


def test_every_wave_respects_its_bucket(spark, sweep_outputs):
    out_dir, _, _, _ = sweep_outputs
    t = open_tables(spark, out_dir)
    rows = t.order_log.read().collect()
    from mizzounewscrawler_spark.functions.urls import url_hash

    assert rows
    for r in rows:
        assert url_hash(r["url_surt"]) % SWEEP == r["wave"] % SWEEP, r


def test_fetch_scan_partition_prunes(spark, sweep_outputs):
    """The plan for a bucket-filtered scan must read ONE bucket partition
    (PartitionFilters prune the rest) — the per-wave I/O claim."""
    _, _, _, pages_b = sweep_outputs
    plan = (
        pages_b.where(F.col("bucket") == 1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan
    # after pruning, the scan's selected partition count is 1 of SWEEP
    pruned = pages_b.where(F.col("bucket") == 1)
    n_all = pages_b.count()
    n_pruned = pruned.count()
    assert 0 < n_pruned < n_all
