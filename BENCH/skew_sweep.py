"""Hot-host skew sweep (VERDICT r4 next #5): does wave-build time stay
flat as one host's share of the pending frontier grows?

The wave scheduler's per-host top-k window sorts each host's pending rows
in one task; a crawler-trap host holding most of the frontier pins one
core.  ``build_wave(salt_partitions=adaptive_nsalts(...))`` is the
engine's guard: a result-identical two-stage salted window that fans the
hot host over 2^k tasks (operators/scheduler.py).

This bench generates Zipf-distributed frontiers (host i's weight
1/i^alpha) at alpha in {1.1, 1.5, 2.0} plus a uniform control, and times
the IDENTICAL wave build unsalted vs adaptively salted at local[32].
Columns: hot host's row share, nsalts the histogram derives, both wall
times, and the salted/unsalted speedup.  Expected shape: unsalted time
grows with the hot share; salted time stays ~flat (bounded by
rows_per_task); at uniform both are equal because adaptive_nsalts
returns 1 and the salted path IS the plain path.

Usage:  python BENCH/skew_sweep.py      # writes BENCH/skew_sweep.json
Env:    SKEW_ROWS (2_000_000), SKEW_HOSTS (2000), SKEW_REPS (3)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from mizzounewscrawler_spark.session import build_session  # noqa: E402


def gen_frontier(spark, n_rows: int, n_hosts: int, alpha: float, seed: int):
    """Deterministic Zipf frontier: host i gets weight 1/(i+1)^alpha
    (alpha=0 → uniform); url_hash/priority from a seeded RNG."""
    rng = np.random.default_rng(seed)
    w = 1.0 / np.power(np.arange(1, n_hosts + 1), alpha)
    cum = np.cumsum(w / w.sum())
    host_idx = np.searchsorted(cum, rng.random(n_rows), side="right")
    pdf = pd.DataFrame(
        {
            "host": pd.Series(host_idx).map(lambda i: f"h{i}.test"),
            "url_hash": rng.integers(
                -(2**63), 2**63 - 1, size=n_rows, dtype=np.int64
            ),
            "priority": rng.integers(0, 7, size=n_rows).astype("float64"),
        }
    )
    hot_share = float(np.bincount(host_idx).max()) / n_rows
    df = (
        spark.createDataFrame(pdf)
        .selectExpr(
            "concat('https://', host, '/p', abs(url_hash) % 1000000) as url",
            "concat(host, ')/p', abs(url_hash) % 1000000) as url_surt",
            "url_hash",
            "host",
            "'discovered' as status",
            "priority",
            "0 as depth",
        )
        .repartition(32, "url_hash")
        .cache()
    )
    df.count()
    return df, hot_share


def dims(spark, n_hosts: int):
    hosts = pd.DataFrame({"host": [f"h{i}.test" for i in range(n_hosts)]})
    seeds = spark.createDataFrame(hosts.assign(bot_sensitivity=1)).cache()
    robots = spark.createDataFrame(
        hosts.assign(user_agent="*", crawl_delay=0.0)
    ).cache()
    seeds.count(), robots.count()
    return seeds, robots


def time_wave(frontier, seeds, robots, nsalts: int, reps: int) -> float:
    from mizzounewscrawler_spark.operators.scheduler import build_wave

    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        build_wave(
            frontier, seeds, robots, None, 0.0, max_per_host=3,
            with_global_order=False, salt_partitions=nsalts,
        ).count()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    n_rows = int(os.environ.get("SKEW_ROWS", "2000000"))
    n_hosts = int(os.environ.get("SKEW_HOSTS", "2000"))
    reps = int(os.environ.get("SKEW_REPS", "3"))
    spark = build_session(32, shuffle_partitions=64, app_name="skew-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    from mizzounewscrawler_spark.operators.scheduler import adaptive_nsalts

    seeds, robots = dims(spark, n_hosts)
    rows = []
    for alpha in (0.0, 1.1, 1.5, 2.0):
        frontier, hot_share = gen_frontier(
            spark, n_rows, n_hosts, alpha, seed=17
        )
        t_hist0 = time.time()
        nsalts = adaptive_nsalts(frontier, rows_per_task=200_000)
        t_hist = round(time.time() - t_hist0, 3)
        t_plain = time_wave(frontier, seeds, robots, 1, reps)
        t_salted = (
            time_wave(frontier, seeds, robots, nsalts, reps)
            if nsalts > 1
            else t_plain
        )
        rows.append(
            {
                "alpha": alpha,
                "rows": n_rows,
                "hosts": n_hosts,
                "hot_share": round(hot_share, 4),
                "nsalts": nsalts,
                "hist_sec": t_hist,
                "unsalted_sec": t_plain,
                "salted_sec": t_salted,
                "speedup": round(t_plain / t_salted, 2) if t_salted else None,
            }
        )
        print(json.dumps(rows[-1]))
        frontier.unpersist()
    out = {
        "bench": "hot-host skew sweep (build_wave window, local[32])",
        "reps": reps,
        "rows_per_task_target": 200_000,
        "sweep": rows,
    }
    with open(os.path.join(HERE, "skew_sweep.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": "BENCH/skew_sweep.json"}))


if __name__ == "__main__":
    main()
