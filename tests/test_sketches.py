"""Heavy hitters: MG candidate pruning must stay exact and certified."""

from __future__ import annotations

import collections

import numpy as np
import pyspark.sql.functions as F
import pytest

from mizzounewscrawler_spark.operators.sketches import (
    _mg_merge,
    heavy_hitters,
    mg_candidates,
)


def _exact_topk(values, k):
    c = collections.Counter(values)
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def _zipf_values():
    rng = np.random.default_rng(7)
    ranks = rng.zipf(1.5, size=20000)
    return [f"key{r}" for r in np.clip(ranks, 1, 500)]


def test_heavy_hitters_matches_exact_topk(spark):
    vals = _zipf_values()
    df = spark.createDataFrame([(v,) for v in vals], "term string").repartition(8)
    got = [(r["term"], r["cnt"]) for r in heavy_hitters(df, "term", k=10).collect()]
    assert got == _exact_topk(vals, 10)


def test_heavy_hitters_finds_key_spread_across_partitions(spark):
    # 'hot' never dominates any single partition's locals but is the global
    # top key — per-partition top-N pruning would lose it; MG must not.
    rows = []
    for p in range(16):
        rows += [(f"local{p}_{i}",) for i in range(30) for _ in range(3)]
        rows += [("hot",)] * 8
    df = spark.createDataFrame(rows, "term string").repartition(16)
    top = heavy_hitters(df, "term", k=1, capacity=40).collect()
    assert top[0]["term"] == "hot" and top[0]["cnt"] == 128


def test_heavy_hitters_refuses_uncertifiable_flat_distribution(spark):
    vals = [f"k{i}" for i in range(2000)]  # every count == 1
    df = spark.createDataFrame([(v,) for v in vals], "term string")
    with pytest.raises(ValueError, match="cannot certify"):
        heavy_hitters(df, "term", k=5, capacity=8)


def test_mg_candidate_set_is_bounded(spark):
    vals = _zipf_values()
    df = spark.createDataFrame([(v,) for v in vals], "term string").repartition(8)
    n_cand = mg_candidates(df, "term", capacity=32).count()
    assert n_cand <= 8 * 32


def test_mg_merge_never_undercounts_heavy_key():
    # MG invariant: counter underestimates by at most sum-of-spills; a key
    # with true count > n/(capacity+1) must survive with a positive count.
    import pandas as pd

    rng = np.random.default_rng(1)
    stream = ["hh"] * 400 + [f"x{i}" for i in rng.integers(0, 3000, 2000)]
    rng.shuffle(stream)
    counters: dict = {}
    for i in range(0, len(stream), 100):
        batch = pd.Series(stream[i : i + 100]).value_counts()
        counters = _mg_merge(counters, batch, capacity=64)
    assert counters.get("hh", 0) > 0  # 400 > 2400/65 ≈ 37 → must survive


# ---------------------------- HyperLogLog ----------------------------


def test_hll_registers_match_python_reference(spark):
    """Every (bucket, rho) must equal the bit-level Python md5 reference."""
    import hashlib

    from mizzounewscrawler_spark.operators.sketches import hll_registers

    keys = list(range(500))
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {r["bucket"]: r["rho"] for r in hll_registers(df, "k").collect()}
    want: dict = {}
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        bucket = int(h[:3], 16)
        w = int(h[3:15], 16)
        rho = 49 if w == 0 else (48 - w.bit_length()) + 1
        want[bucket] = max(want.get(bucket, 0), rho)
    assert got == want


def test_hll_estimate_accuracy_and_null_skip(spark):
    from mizzounewscrawler_spark.operators.sketches import approx_distinct

    n = 20000
    df = spark.createDataFrame(
        [(f"url-{i % n}",) for i in range(2 * n)] + [(None,)], "k string"
    )
    row = approx_distinct(df, "k").collect()[0]
    # p=12 → standard error 1.04/sqrt(4096) ≈ 1.6%; allow 5%
    assert abs(row["est_distinct"] - n) / n < 0.05
    assert row["n_buckets"] == 4096


def test_hll_merge_equals_union_sketch(spark):
    from mizzounewscrawler_spark.operators.sketches import (
        hll_merge,
        hll_registers,
    )

    a = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    b = spark.createDataFrame([(i,) for i in range(500, 1500)], "k long")
    merged = {
        r["bucket"]: r["rho"]
        for r in hll_merge(
            hll_registers(a, "k"), hll_registers(b, "k")
        ).collect()
    }
    direct = {
        r["bucket"]: r["rho"]
        for r in hll_registers(a.unionByName(b), "k").collect()
    }
    assert merged == direct


def test_hll_catalog_oracle_parity(spark):
    """hll_distinct catalog entry matches DuckDB register-for-register at
    sf0.001 (value-exact through the floating estimator's round-4)."""
    import duckdb

    from mizzounewscrawler_spark.plans.relational import (
        SQL_HLL_DISTINCT,
        q_hll_distinct,
    )

    sf = "/root/testdata/sf0.001"
    got = [tuple(r) for r in q_hll_distinct(spark, sf).collect()]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    want = [tuple(r) for r in con.sql(SQL_HLL_DISTINCT).fetchall()]
    assert got == want


def test_hll_bad_p_raises(spark):
    import pytest as _pytest

    from mizzounewscrawler_spark.operators.sketches import hll_registers

    df = spark.createDataFrame([(1,)], "k long")
    with _pytest.raises(ValueError):
        hll_registers(df, "k", p=10)


# ---------------------------- Count-min ----------------------------


def test_cms_grid_matches_python_reference(spark):
    """Every non-empty cell equals the bit-level md5 Python reference."""
    import hashlib

    from mizzounewscrawler_spark.operators.sketches import cms_sketch

    keys = [f"k{i % 50}" for i in range(300)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {(r["row"], r["col"]): r["cnt"]
           for r in cms_sketch(df, "k", d=4, w=64).collect()}
    want: dict = {}
    for k in keys:
        for row in range(4):
            h = hashlib.md5(f"{row}:{k}".encode()).hexdigest()
            col = int(h[:8], 16) % 64
            want[(row, col)] = want.get((row, col), 0) + 1
    assert got == want


def test_cms_no_underestimate_and_accuracy(spark):
    from mizzounewscrawler_spark.operators.sketches import (
        cms_query,
        cms_sketch,
    )

    rows = [(f"hot-{i % 5}",) for i in range(5000)] + [
        (f"cold-{i}",) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "k string")
    sk = cms_sketch(df, "k")
    exact = {r["k"]: r["cnt"]
             for r in df.groupBy("k").count().withColumnRenamed("count", "cnt").collect()}
    est = {r["k"]: r["est"]
           for r in cms_query(sk, df.select("k"), "k").collect()}
    n = len(rows)
    for k, e in est.items():
        assert e >= exact[k], k            # CMS never underestimates
        assert e - exact[k] <= 3 * n / 1024  # within a few eps*N


def test_cms_merge_equals_union_sketch(spark):
    from mizzounewscrawler_spark.operators.sketches import (
        cms_merge,
        cms_sketch,
    )

    a = spark.createDataFrame([(f"x{i % 9}",) for i in range(200)], "k string")
    b = spark.createDataFrame([(f"x{i % 13}",) for i in range(300)], "k string")
    merged = {(r["row"], r["col"]): r["cnt"]
              for r in cms_merge(cms_sketch(a, "k"), cms_sketch(b, "k")).collect()}
    direct = {(r["row"], r["col"]): r["cnt"]
              for r in cms_sketch(a.unionByName(b), "k").collect()}
    assert merged == direct


def test_cms_catalog_oracle_parity(spark):
    import duckdb

    from mizzounewscrawler_spark.plans.relational import (
        SQL_CMS_FREQUENCIES,
        q_cms_frequencies,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(tuple(r) for r in q_cms_frequencies(spark, sf).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = sorted(tuple(r) for r in con.sql(SQL_CMS_FREQUENCIES).fetchall())
    assert got == want
    assert all(r[3] for r in got)  # no_underestimate everywhere


def test_hll_empty_input_estimates_zero(spark):
    from mizzounewscrawler_spark.operators.sketches import approx_distinct

    df = spark.createDataFrame([], "k string")
    row = approx_distinct(df, "k").collect()[0]
    assert row["est_distinct"] == 0.0
    assert row["zero_buckets"] == 4096


# ----------------------- log-binned quantile sketch -----------------------


def test_log_histogram_bounds_and_skew(spark):
    """On a skewed value set every sketch quantile lower-bounds the true
    value within the 1+2^-3 relative-error guarantee."""
    from mizzounewscrawler_spark.operators.sketches import (
        histogram_quantile,
        log_histogram,
    )

    vals = [int(1.5 ** i) + 1 for i in range(30) for _ in range(i + 1)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    hist = log_histogram(df, "v")
    sv = sorted(vals)
    n = len(sv)
    for p in (10, 50, 90, 99):
        est = histogram_quantile(hist, p).collect()[0]["est"]
        exact = sv[(n - 1) * p // 100]
        assert est <= exact < est * (1 + 2 ** -3) + 1, (p, est, exact)


def test_log_histogram_merge_equals_union(spark):
    from mizzounewscrawler_spark.operators.sketches import (
        log_histogram,
        log_histogram_merge,
    )

    a = spark.createDataFrame([(i % 97 + 1,) for i in range(500)], "v long")
    b = spark.createDataFrame([(i % 31 + 5,) for i in range(400)], "v long")
    merged = {
        (r["e"], r["top"]): r["cnt"]
        for r in log_histogram_merge(
            log_histogram(a, "v"), log_histogram(b, "v")
        ).collect()
    }
    direct = {
        (r["e"], r["top"]): r["cnt"]
        for r in log_histogram(a.unionByName(b), "v").collect()
    }
    assert merged == direct


def test_log_histogram_grouped_quantiles(spark):
    from mizzounewscrawler_spark.operators.sketches import (
        histogram_quantile,
        log_histogram,
    )

    rows = [("a", i + 1) for i in range(100)] + [
        ("b", (i + 1) * 1000) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    hist = log_histogram(df, "v", group_cols=["g"])
    out = {r["g"]: r["est"]
           for r in histogram_quantile(hist, 50, group_cols=["g"]).collect()}
    assert out["a"] <= 51 < out["a"] * 1.126
    assert out["b"] <= 26000 < out["b"] * 1.126


def test_quantile_sketch_catalog_oracle_parity(spark):
    import duckdb

    from mizzounewscrawler_spark.plans.relational import (
        SQL_QUANTILE_SKETCH,
        q_quantile_sketch,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(tuple(r) for r in q_quantile_sketch(spark, sf).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    want = sorted(tuple(r) for r in con.sql(SQL_QUANTILE_SKETCH).fetchall())
    assert got == want
    assert len(got) == 3 and all(r[4] for r in got)  # within_bound everywhere
