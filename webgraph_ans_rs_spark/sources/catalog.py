"""Versioned table catalog — the Iceberg-shaped storage layer, on parquet.

The north star stores tables in Iceberg; this sandbox has no Iceberg
runtime jars, so this module provides the same *protocol* on plain
parquet: every write is an immutable snapshot directory plus a manifest
commit, reads resolve the latest (or any historical) snapshot, and commits
are atomic via rename of the manifest pointer. Swap-in note: with Iceberg
available, `VersionedTable` collapses to `df.writeTo(name).createOrReplace()`
and `spark.read.option("snapshot-id", …)` — call sites don't change shape.

Reference analogue: the Prelude + .pointers + .states triple is a
self-describing, versioned on-disk artifact (SURVEY.md §1.4); here the
manifest carries the same role (schema, row count, lineage of the commit).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class VersionedTable:
    def __init__(self, spark: SparkSession, root: str, name: str):
        self.spark = spark
        self.dir = os.path.join(root, name)
        os.makedirs(self.dir, exist_ok=True)

    # -- write -------------------------------------------------------------
    def commit(self, df: DataFrame, properties: dict | None = None) -> int:
        """Write a new immutable snapshot; returns its id.

        Crash-safety: data lands in a unique temp dir and is renamed to its
        snap-NNNNNN home just before the manifest commit, and ``_next_id``
        counts orphaned snap dirs (data renamed, manifest never written) as
        taken — a crash can orphan at most one uuid-temp or snap dir, never
        wedge future commits by id reuse.
        """
        import shutil
        import uuid

        tmp_data = os.path.join(self.dir, f".tmp-{uuid.uuid4().hex}")
        try:
            df.write.mode("errorifexists").parquet(tmp_data)
            rows = self.spark.read.parquet(tmp_data).count()
            sid = self._next_id()
            data_dir = os.path.join(self.dir, f"snap-{sid:06d}")
            os.rename(tmp_data, data_dir)
        except BaseException:
            # a failed write must not accumulate orphaned .tmp dirs forever
            shutil.rmtree(tmp_data, ignore_errors=True)
            raise
        manifest = {
            "snapshot_id": sid,
            "data_dir": data_dir,
            "schema": df.schema.jsonValue(),
            "rows": rows,
            "committed_at": time.time(),
            "properties": properties or {},
        }
        tmp = os.path.join(self.dir, f".manifest-{sid:06d}.tmp")
        final = os.path.join(self.dir, f"manifest-{sid:06d}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, final)  # atomic commit point
        return sid

    # -- read --------------------------------------------------------------
    def snapshots(self) -> list[int]:
        out = []
        for name in os.listdir(self.dir):
            if name.startswith("manifest-") and name.endswith(".json"):
                out.append(int(name[len("manifest-") : -len(".json")]))
        return sorted(out)

    def manifest(self, snapshot_id: int | None = None) -> dict:
        sid = snapshot_id if snapshot_id is not None else self.snapshots()[-1]
        with open(os.path.join(self.dir, f"manifest-{sid:06d}.json")) as f:
            return json.load(f)

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        """Latest snapshot by default; pass an id for time travel."""
        return self.spark.read.parquet(self.manifest(snapshot_id)["data_dir"])

    def _next_id(self) -> int:
        """One past the max id seen in EITHER manifests or snap-* data dirs
        (orphaned data dirs from a crashed commit must not be reused)."""
        taken = set(self.snapshots())
        for name in os.listdir(self.dir):
            if name.startswith("snap-"):
                try:
                    taken.add(int(name[len("snap-") :]))
                except ValueError:
                    continue
        return (max(taken) + 1) if taken else 1

    # -- maintenance -------------------------------------------------------
    def expire_snapshots(self, keep_last: int = 2) -> list[int]:
        """Delete all but the newest ``keep_last`` snapshots (manifest
        first, then data, so a crash mid-expiry leaves an orphaned data
        dir — which ``_next_id`` already tolerates — never a manifest
        pointing at deleted data). Returns the expired ids. The Iceberg
        maintenance analogue (`expireSnapshots`); long-running iterative
        jobs need it or per-superstep commits accumulate unboundedly."""
        import shutil

        sids = self.snapshots()
        expired = sids[:-keep_last] if keep_last > 0 else sids
        for sid in expired:
            data_dir = self.manifest(sid)["data_dir"]
            os.remove(os.path.join(self.dir, f"manifest-{sid:06d}.json"))
            shutil.rmtree(data_dir, ignore_errors=True)
        return expired
