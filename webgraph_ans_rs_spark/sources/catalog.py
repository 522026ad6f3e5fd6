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
        """Write a new immutable snapshot; returns its id."""
        sid = self._next_id()
        data_dir = os.path.join(self.dir, f"snap-{sid:06d}")
        df.write.mode("errorifexists").parquet(data_dir)
        rows = self.spark.read.parquet(data_dir).count()
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
        snaps = self.snapshots()
        return (snaps[-1] + 1) if snaps else 1
