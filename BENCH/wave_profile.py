"""Per-wave job/stage profiler for the crawl loop.

Runs a short crawl with a Spark listener attached (py4j callback-free: we
poll the status tracker + REST-free StageInfo via the JVM statusStore) and
prints, per job, its wall time and stage task-time sum — separating
"cluster work" (task seconds, shrinks with cores) from "driver/fixed time"
(wall − max-stage-parallel time, does not shrink).  Use to attribute the
per-wave fixed cost the scaling gate is sensitive to.

Usage: python BENCH/profile.py  [env: PROF_CORES=32 BENCH_* as bench.py]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def main() -> None:
    cores = int(os.environ.get("PROF_CORES", "32"))
    n_hosts = int(os.environ.get("BENCH_HOSTS", "4000"))
    pages = int(os.environ.get("BENCH_PAGES", "120000"))
    waves = int(os.environ.get("BENCH_WAVES", "3"))

    from bench import bench_crawl
    from mizzounewscrawler_spark.session import build_session

    spark = build_session(
        cores,
        shuffle_partitions=int(os.environ.get("BENCH_SHUFFLE", "64")),
        app_name="mnc-profile",
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    out = bench_crawl(spark, n_hosts, pages, waves)
    wall = time.time() - t0

    # JVM status store: per-job wall + per-stage task-time totals
    jvm_store = spark.sparkContext._jsc.sc().statusStore()
    jobs = jvm_store.jobsList(None)
    rows = []
    for i in range(jobs.size()):
        j = jobs.apply(i)
        sub = j.submissionTime()
        comp = j.completionTime()
        if sub.isEmpty() or comp.isEmpty():
            continue
        sub_ms = sub.get().getTime()
        comp_ms = comp.get().getTime()
        name = j.name()
        rows.append(
            {
                "job": j.jobId(),
                "wall_s": round((comp_ms - sub_ms) / 1000.0, 3),
                "submitted_off_s": round(sub_ms / 1000.0, 3),
                "stages": j.stageIds().size(),
                "tasks": j.numTasks(),
                "name": name[:80],
            }
        )
    rows.sort(key=lambda r: r["submitted_off_s"])
    base = rows[0]["submitted_off_s"] if rows else 0
    intervals = []
    for r in rows:
        start = r["submitted_off_s"] - base
        intervals.append((start, start + r["wall_s"]))
        r["submitted_off_s"] = round(start, 3)
    # union of job intervals = "some Spark job was running"; the complement
    # within the crawl wall is pure driver time (planning, py4j round trips,
    # manifest commits, footer reads) — the cost that does NOT shrink with
    # cores and therefore bounds N→4N scaling efficiency
    busy = 0.0
    last_end = -1.0
    for s, e in sorted(intervals):
        s = max(s, last_end)
        if e > s:
            busy += e - s
            last_end = e
        else:
            last_end = max(last_end, e)
    total_job_wall = sum(r["wall_s"] for r in rows)
    print(json.dumps({
        "cores": cores,
        "crawl_wall_s": round(wall, 2),
        "job_busy_union_s": round(busy, 2),
        "driver_only_s": round(wall - busy, 2),
        "sum_job_wall_s": round(total_job_wall, 2),
        "n_jobs": len(rows),
        "per_wave": out["per_wave"],
        "jobs": rows,
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
