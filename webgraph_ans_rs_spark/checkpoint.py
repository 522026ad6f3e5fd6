"""Per-superstep checkpointing with lineage + metrics, and mid-run resume.

The DataFrame analogue of the reference's per-node resume points: an
``ANSCompressorPhase { state, stream_pointer }`` is captured per node while
encoding (/root/reference/src/ans/mod.rs:62-68,
src/bvgraph/writers/bvgraph_encoder.rs:167-171) and serialized as
``.states`` / ``.pointers`` (random_access.rs:198-221) so decoding can jump
into the middle of the stream. Here, each iterative job (PageRank / CC / LP)
commits its full vertex-state snapshot per superstep plus a lineage row per
*partition* (row counts) and per-iteration metrics; a restarted job reads
the max committed iteration and continues — producing bit-identical final
output (asserted by tests/test_checkpoint_resume.py).

Layout (parquet; an Iceberg catalog would make these table snapshots, the
protocol is identical):

  {root}/{job_id}/snapshots/iter=NNNNN/    vertex-state parquet (+ _SUCCESS)
  {root}/{job_id}/lineage/                 (job_id, iteration, partition_id,
                                            rows, committed_at, metric keys)

Commit order is snapshot-then-lineage; an interrupted commit leaves either
no _SUCCESS (snapshot ignored) or a snapshot without lineage (still
resumable) — never a lineage row pointing at a missing snapshot that
``latest_snapshot`` would trust, because resume keys off _SUCCESS markers.
"""

from __future__ import annotations

import datetime
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointManager:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")

    # -- paths -------------------------------------------------------------
    def _snap_dir(self, job_id: str, iteration: int) -> str:
        return f"{self.root}/{job_id}/snapshots/iter={iteration:05d}"

    def _lineage_dir(self, job_id: str) -> str:
        return f"{self.root}/{job_id}/lineage"

    # -- commit ------------------------------------------------------------
    def commit(
        self, job_id: str, iteration: int, state: DataFrame, metrics: dict | None = None
    ) -> None:
        """Atomically persist the superstep state + per-partition lineage."""
        snap = self._snap_dir(job_id, iteration)
        state.write.mode("overwrite").parquet(snap)
        committed = self.spark.read.parquet(snap)
        per_part = (
            committed.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows"))
            .withColumn("job_id", F.lit(job_id))
            .withColumn("iteration", F.lit(iteration))
            .withColumn("metrics", F.lit(json.dumps(metrics or {}, sort_keys=True)))
            .withColumn(
                "committed_at",
                F.lit(datetime.datetime.now(datetime.timezone.utc).isoformat()),
            )
            .select("job_id", "iteration", "partition_id", "rows", "metrics", "committed_at")
        )
        per_part.write.mode("append").parquet(self._lineage_dir(job_id))

    # -- resume ------------------------------------------------------------
    def committed_iterations(self, job_id: str) -> list[int]:
        base = f"{self.root}/{job_id}/snapshots"
        if not os.path.isdir(_strip_scheme(base)):
            return []
        out = []
        for name in os.listdir(_strip_scheme(base)):
            if name.startswith("iter=") and os.path.exists(
                os.path.join(_strip_scheme(base), name, "_SUCCESS")
            ):
                out.append(int(name.split("=", 1)[1]))
        return sorted(out)

    def latest_snapshot(self, job_id: str) -> tuple[int, DataFrame] | None:
        its = self.committed_iterations(job_id)
        if not its:
            return None
        it = its[-1]
        return it, self.spark.read.parquet(self._snap_dir(job_id, it))

    def lineage(self, job_id: str) -> DataFrame | None:
        path = self._lineage_dir(job_id)
        if not os.path.isdir(_strip_scheme(path)):
            return None
        return self.spark.read.parquet(path)


def _strip_scheme(path: str) -> str:
    return path[len("file:") :] if path.startswith("file:") else path
