"""North-rule deployment shape: the engine runs via spark-submit with the
package shipped as a --py-files zip — no editable install, no PYTHONPATH
hack.  This test builds the zip, launches a REAL spark-submit subprocess
(local master standing in for the cluster), and checks the crawl ran and
committed snapshots."""

from __future__ import annotations

import json
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


def test_spark_submit_pyfiles_crawl():
    with tempfile.TemporaryDirectory(prefix="submit_") as tmp:
        zpath = _make_zip(tmp)
        out = os.path.join(tmp, "lake")
        env = {**os.environ, "PYSPARK_PYTHON": sys.executable,
               "PYSPARK_DRIVER_PYTHON": sys.executable}
        # the job must not need the repo on PYTHONPATH — only the zip
        env.pop("PYTHONPATH", None)
        cmd = [
            _spark_submit(),
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            os.path.join(REPO, "jobs", "crawl_job.py"),
            "--out", out,
            "--synthetic", "8:200:7",
            "--waves", "2",
            # exercise the deletable sharded filter through the real
            # --py-files packaging path too
            "--url-seen-filter", "cuckoo",
            "--sharded", "--shard-bits", "3",
        ]
        proc = subprocess.run(
            cmd, cwd=tmp, env=env, capture_output=True, text=True, timeout=420
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        stats_line = [
            ln for ln in proc.stdout.splitlines() if ln.startswith("{")
        ][-1]
        stats = json.loads(stats_line)
        assert stats["waves_run"] == 2
        assert stats["scheduled"] > 0
        # snapshots committed on disk (resumable checkpoint)
        snapdir = os.path.join(out, "frontier", "snapshots")
        assert os.path.isdir(snapdir) and len(os.listdir(snapdir)) >= 2
        # sharded cuckoo persisted its per-shard files + manifest
        sdir = os.path.join(out, "cuckoo_shards")
        assert os.path.isfile(os.path.join(sdir, "params.json"))
        assert any(n.startswith("shard_") for n in os.listdir(sdir))
