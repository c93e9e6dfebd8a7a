"""IceLite — snapshot-versioned parquet tables with Iceberg-style semantics.

The north rule calls for Iceberg tables whose snapshot summaries carry
frontier/fetched/deduped counters and per-partition lineage so a killed job
resumes from the last committed checkpoint.  This container has no Iceberg
runtime jar, so IceLite provides the same *semantics* on plain parquet:

- every commit writes a new immutable data directory ``data/v{NNNN}/`` plus a
  JSON manifest ``snapshots/v{NNNN}.json`` holding ``summary`` properties
  (arbitrary string/number map — our counters + lineage) and the list of live
  data versions;
- the manifest write is atomic (write tmp + ``os.replace``), so a reader
  either sees the previous snapshot or the complete new one — a crash
  mid-commit leaves orphan data files but a consistent table;
- reads resolve the latest (or an explicit) snapshot and load only its live
  data directories — time travel for free;
- ``append`` keeps prior versions live (Iceberg append), ``overwrite``
  replaces them (Iceberg overwrite).

On a real cluster this module is replaced 1:1 by Iceberg:
``df.writeTo(tbl).option("snapshot-property.frontier", …).append()`` and
``spark.read.option("snapshot-id", …).table(tbl)`` — callers only touch the
``LakeTable`` API so the swap is one import.

Reference parity: the reference's checkpointing is DB status columns +
idempotent upserts (src/models/database.py:797-863) and versioned exports with
checksums (src/models/versioning.py:113-330); snapshots subsume both.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Snapshot:
    version: int
    summary: dict[str, Any]
    live_versions: list[int]
    schema_json: str = ""
    parent: int | None = None

    @property
    def snapshot_id(self) -> int:
        return self.version


@dataclass
class LakeTable:
    """A snapshot-versioned parquet table rooted at ``path``."""

    spark: SparkSession
    path: str
    _cache: dict[int, Snapshot] = field(default_factory=dict)

    # -- snapshot bookkeeping -------------------------------------------------

    @property
    def _snap_dir(self) -> str:
        return os.path.join(self.path, "snapshots")

    def _data_dir(self, version: int) -> str:
        return os.path.join(self.path, "data", f"v{version:06d}")

    def snapshots(self) -> list[Snapshot]:
        if not os.path.isdir(self._snap_dir):
            return []
        out = []
        for name in sorted(os.listdir(self._snap_dir)):
            if not name.endswith(".json"):
                continue
            version = int(name[1:-5])
            if version not in self._cache:
                with open(os.path.join(self._snap_dir, name)) as f:
                    raw = json.load(f)
                self._cache[version] = Snapshot(
                    version=version,
                    summary=raw.get("summary", {}),
                    live_versions=raw.get("live_versions", []),
                    schema_json=raw.get("schema_json", ""),
                    parent=raw.get("parent"),
                )
            out.append(self._cache[version])
        return out

    def current_snapshot(self) -> Snapshot | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    def exists(self) -> bool:
        return self.current_snapshot() is not None

    # -- writes ---------------------------------------------------------------

    def _commit(
        self, df: DataFrame, mode: str, summary: dict[str, Any] | None
    ) -> Snapshot:
        prev = self.current_snapshot()
        version = (prev.version + 1) if prev else 0
        data_dir = self._data_dir(version)
        df.write.mode("errorifexists").parquet(data_dir)

        if mode == "append" and prev is not None:
            live = [*prev.live_versions, version]
        else:
            live = [version]

        snap_summary = dict(summary or {})
        snap_summary.setdefault("committed_at", time.time())
        snap_summary.setdefault("operation", mode)
        manifest = {
            "summary": snap_summary,
            "live_versions": live,
            "schema_json": df.schema.json(),
            "parent": prev.version if prev else None,
        }
        os.makedirs(self._snap_dir, exist_ok=True)
        tmp = os.path.join(self._snap_dir, f".v{version:06d}.json.tmp")
        final = os.path.join(self._snap_dir, f"v{version:06d}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, final)  # atomic commit point
        snap = Snapshot(
            version=version,
            summary=snap_summary,
            live_versions=live,
            schema_json=manifest["schema_json"],
            parent=manifest["parent"],
        )
        self._cache[version] = snap
        return snap

    def append(self, df: DataFrame, summary: dict[str, Any] | None = None) -> Snapshot:
        return self._commit(df, "append", summary)

    def overwrite(
        self, df: DataFrame, summary: dict[str, Any] | None = None
    ) -> Snapshot:
        return self._commit(df, "overwrite", summary)

    # -- reads ----------------------------------------------------------------

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        snaps = self.snapshots()
        if not snaps:
            raise FileNotFoundError(f"LakeTable at {self.path} has no snapshots")
        snap = snaps[-1] if snapshot_id is None else self._cache[snapshot_id]
        dirs = [self._data_dir(v) for v in snap.live_versions]
        return self.spark.read.parquet(*dirs)
