"""Driver-side Bloom increment + staged-column read + expr-tree memo.

The wave loop maintains the URL-seen Bloom filter with
:func:`add_hashes` (numpy bit ops on the driver, no Spark job) for
wave-sized increments, reading the new hashes back from the parquet the
``url_seen`` stage already wrote (:meth:`LakeTable.staged_column`).  These
tests pin the contract that makes that safe:

1. ``add_hashes`` is BIT-IDENTICAL to the distributed
   ``merge_blooms(base, build_bloom(new))`` path for the same geometry —
   so switching paths by increment size (crawl.py) can never change
   membership answers.
2. ``staged_column`` returns exactly the staged column's values.
3. ``session_memo`` caches per (SparkContext, args) — stale trees from a
   stopped context must not leak into a new one.
"""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest

from mizzounewscrawler_spark.functions import exprcache
from mizzounewscrawler_spark.lake import LakeTable
from mizzounewscrawler_spark.operators.dedup import (
    PartitionedBloom,
    add_hashes,
    build_bloom,
    merge_blooms,
)


@pytest.fixture(scope="module")
def hashes():
    rng = np.random.default_rng(1234)
    return rng.integers(np.iinfo(np.int64).min, np.iinfo(np.int64).max, 600).astype(
        np.int64
    )


def test_add_hashes_matches_distributed_build(spark, hashes):
    base, new = hashes[:400], hashes[400:]
    params = (4096, 7)
    base_df = spark.createDataFrame([(int(h),) for h in base], "url_hash long")
    new_df = spark.createDataFrame([(int(h),) for h in new], "url_hash long")
    bloom = build_bloom(base_df, "url_hash", shard_bits=3, params=params)

    distributed = merge_blooms(
        bloom, build_bloom(new_df, "url_hash", shard_bits=3, params=params)
    )
    driver_side = add_hashes(bloom, new)

    assert driver_side.m == distributed.m and driver_side.k == distributed.k
    assert set(driver_side.shards) == set(distributed.shards)
    for sid, bits in distributed.shards.items():
        assert driver_side.shards[sid] == bits, f"shard {sid} bitmap differs"
    # and the membership contract holds: no false negatives on either path
    assert driver_side.contains(hashes).all()


def test_add_hashes_empty_is_identity(hashes):
    bloom = PartitionedBloom(shard_bits=2, m=1024, k=5, shards={})
    bloom = add_hashes(bloom, hashes[:50])
    out = add_hashes(bloom, np.empty(0, dtype=np.int64))
    assert out.shards == bloom.shards


def test_add_hashes_does_not_mutate_input(hashes):
    bloom = PartitionedBloom(shard_bits=2, m=1024, k=5, shards={})
    b1 = add_hashes(bloom, hashes[:100])
    before = {sid: bytes(b) for sid, b in b1.shards.items()}
    add_hashes(b1, hashes[100:200])
    assert {sid: bytes(b) for sid, b in b1.shards.items()} == before


def test_staged_column_roundtrip(spark, hashes):
    tmp = tempfile.mkdtemp(prefix="staged_col_")
    try:
        t = LakeTable(spark, f"{tmp}/tbl")
        df = spark.createDataFrame(
            [(int(h), f"u{i}") for i, h in enumerate(hashes[:100])],
            "url_hash long, url_surt string",
        )
        staged = t.stage(df)
        vals = t.staged_column(staged, "url_hash")
        assert sorted(vals.tolist()) == sorted(int(h) for h in hashes[:100])
        # empty stage (deletes only) yields an empty array, not an error
        dk = spark.createDataFrame([(1,)], "url_hash long")
        staged2 = t.stage(None, delete_keys=dk)
        assert len(t.staged_column(staged2, "url_hash")) == 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_session_memo_keyed_by_context_and_args(spark):
    calls = []

    @exprcache.session_memo
    def builder(name: str):
        calls.append(name)
        return object()

    a1 = builder("x")
    a2 = builder("x")
    b1 = builder("y")
    assert a1 is a2 and a1 is not b1
    assert calls == ["x", "y"]
    # a different context key must miss the cache (simulated: clear, as a
    # stopped SparkContext changes id() — contract documented in exprcache)
    exprcache.clear_expr_cache()
    builder("x")
    assert calls == ["x", "y", "x"]


def test_distributed_increment_path_crawl_parity(spark, web, web_spark):
    """End-to-end guard on the DISTRIBUTED Bloom-increment branch
    (``discovered_new > cfg.bloom_driver_increment_max`` — build_bloom over
    the staged url_seen files, OR-merged): forcing it on every wave must
    reproduce the reference simulator exactly, same as the driver-side
    default.  Regression for the r4 NameError in that branch (it referenced
    a variable that had moved into ``_stage_dedup``)."""
    from mizzounewscrawler_spark.crawl import CrawlConfig, open_tables, run_crawl
    from mizzounewscrawler_spark.simulator import simulate_crawl

    pages, seeds, robots = web_spark
    out_dir = tempfile.mkdtemp(prefix="bulk_bloom_")
    try:
        cfg = CrawlConfig(max_waves=3, use_bloom=True, bloom_driver_increment_max=0)
        run_crawl(spark, pages, seeds, robots, out_dir, cfg)
        sim = simulate_crawl(web.pages, web.seeds, web.robots, max_waves=3)
        t = open_tables(spark, out_dir)
        engine_seen = {r["url_surt"] for r in t.url_seen.read().collect()}
        assert engine_seen == sim.seen
        engine_order = [
            (r["wave"], r["seq"], r["url_surt"])
            for r in t.order_log.read().orderBy("wave", "seq").collect()
        ]
        assert engine_order == sim.order
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
