"""S1 dataset scoping: datasets/dataset_sources M:N + semi-join filters
(reference src/models/__init__.py:542-580, discovery.py:2071-2326)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from mizzounewscrawler_spark.crawl import CrawlConfig, open_tables, run_crawl
from mizzounewscrawler_spark.operators.datasets import scope_sources


def _dataset_dim(spark, web, label, n):
    """A dataset containing the first n sources of the fixture web."""
    ids = sorted(web.seeds["source_id"])[:n]
    return spark.createDataFrame(
        [(label, sid) for sid in ids], "dataset_label string, source_id string"
    ), [s.removeprefix("src-") for s in ids]


def test_scope_sources_semi_join(spark, web_spark, web):
    _, seeds, _ = web_spark
    ds, hosts = _dataset_dim(spark, web, "pilot", 3)
    out = scope_sources(seeds, ds, "pilot")
    assert sorted(r["host"] for r in out.collect()) == sorted(hosts)
    # unknown label → empty scope
    assert scope_sources(seeds, ds, "nope").count() == 0


def test_crawl_scoped_to_two_source_dataset(spark, web_spark, web):
    pages, seeds, robots = web_spark
    ds, hosts = _dataset_dim(spark, web, "duo", 2)
    out = tempfile.mkdtemp(prefix="crawl_dataset_")
    cfg = CrawlConfig(max_waves=3, bloom_capacity=10000, dataset_label="duo")
    run_crawl(spark, pages, seeds, robots, out, cfg, dataset_sources=ds)
    t = open_tables(spark, out)
    seen_hosts = {
        r["host"]
        for r in t.articles.read().select("host").distinct().collect()
    }
    assert seen_hosts, "scoped crawl fetched nothing"
    assert seen_hosts <= set(hosts), seen_hosts
    # everything in url_seen belongs to the dataset's hosts too (admission
    # is scoped, not just fetching)
    frontier_hosts = {
        r["host"]
        for r in t.url_seen.read()
        .select(
            F.array_join(
                F.reverse(
                    F.split(F.substring_index(F.col("url_surt"), ")", 1), ",")
                ),
                ".",
            ).alias("host")
        )
        .distinct()
        .collect()
    }
    assert frontier_hosts <= set(hosts), frontier_hosts


def test_dataset_label_without_dim_raises(spark, web_spark):
    pages, seeds, robots = web_spark
    cfg = CrawlConfig(max_waves=1, dataset_label="x")
    with pytest.raises(ValueError, match="dataset_sources"):
        run_crawl(spark, pages, seeds, robots, tempfile.mkdtemp(), cfg)
