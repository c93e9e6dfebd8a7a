"""SURVEY §5(c): two-parallelism determinism — the SAME crawl job run at
two core counts (the sandbox stand-in for two cluster sizes, per the north
rule's N→4N criterion) must produce IDENTICAL results: url-seen set, global
crawl order, and per-URL extracted-content hashes.  The engine claims its
plans are deterministic by construction (virtual politeness clock, seeded
hashes, order keys independent of physical partitioning); this pins it.

Runs the real spark-submit deployment shape (own JVM per level) so the two
levels share no session state.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_zip(dest: str) -> str:
    zpath = os.path.join(dest, "mnc.zip")
    pkg = os.path.join(REPO, "mizzounewscrawler_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def _spark_submit() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def _run_level(tmp: str, zpath: str, cores: int) -> str:
    out = os.path.join(tmp, f"lake_c{cores}")
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable,
           "PYSPARK_DRIVER_PYTHON": sys.executable}
    env.pop("PYTHONPATH", None)
    cmd = [
        _spark_submit(),
        "--master", f"local[{cores}]",
        # shuffle width pinned the same at both levels (the scaling
        # harness's protocol); AQE may still coalesce differently — the
        # point of the test is that results don't care
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zpath,
        os.path.join(REPO, "jobs", "crawl_job.py"),
        "--out", out,
        "--synthetic", "8:200:7",
        "--waves", "3",
        "--order-log",
    ]
    proc = subprocess.run(
        cmd, cwd=tmp, env=env, capture_output=True, text=True, timeout=420
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return out


def test_same_results_at_two_parallelism_levels(spark):
    from mizzounewscrawler_spark.crawl import open_tables

    with tempfile.TemporaryDirectory(prefix="twopar_") as tmp:
        zpath = _make_zip(tmp)
        outs = [_run_level(tmp, zpath, cores) for cores in (2, 8)]

        def snapshot(out_dir):
            t = open_tables(spark, out_dir)
            seen = {r["url_surt"] for r in t.url_seen.read().collect()}
            order = [
                (r["wave"], r["seq"], r["url_surt"])
                for r in t.order_log.read().orderBy("wave", "seq").collect()
            ]
            arts = {
                r["url"]: (r["status"], r["content_hash"])
                for r in t.articles.read().collect()
            }
            return seen, order, arts

        seen2, order2, arts2 = snapshot(outs[0])
        seen8, order8, arts8 = snapshot(outs[1])
        assert seen2 == seen8
        assert order2 == order8
        assert arts2 == arts8
        assert len(order2) > 0 and len(arts2) > 0
