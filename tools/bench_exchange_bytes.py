"""Measure bytes-through-exchange per PageRank superstep: dense ids vs
full-entropy hashed ids, same graph.

Why this experiment exists (VERDICT r02 §next-6): the 2→8-core scaling
residual was pinned on single-socket memory bandwidth, so the remaining
lever is moving fewer bytes per edge through the gather exchange. Spark's
hash aggregation exchanges (key, partial-sum) rows in UnsafeRow format —
fixed 8-byte slots, and sum buffers are doubles regardless of the input
value type, so casting ranks to float32 or ids to int32 does NOT shrink the
rows. What does shrink the *wire* bytes is shuffle compression (lz4) acting
on low-entropy keys: dense 0..V ids are mostly zero bytes, xxhash64 ids are
incompressible. This tool quantifies exactly that, from the event log
(SparkListenerStageCompleted shuffle write metrics), alongside loop time.

Usage: python tools/bench_exchange_bytes.py [cpus] [vertices] [variant]
``variant`` ∈ {dense, hashed, both}; default both. Running both in ONE
process contaminates the second variant's LOOP TIME (two cached graphs +
accumulated heap) — byte counters are unaffected, but for timing run each
variant in its own process, interleaved (see BENCH_EXCHANGE.json
protocol note).
Prints one JSON line {"variants": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from webgraph_ans_rs_spark.operators.pagerank import pagerank  # noqa: E402
from webgraph_ans_rs_spark.plans.bench_graph import synthetic_edges  # noqa: E402
from webgraph_ans_rs_spark.session import get_spark  # noqa: E402

SUPERSTEPS = 5


def shuffle_bytes_from_eventlog(log_dir: str) -> tuple[int, int]:
    """(shuffle_write_bytes, shuffle_read_bytes) summed over all completed
    stages in every app log under log_dir."""
    wr = rd = 0
    paths = []
    for root, _dirs, files in os.walk(log_dir):
        paths.extend(
            os.path.join(root, n) for n in files if n.startswith("events")
        )
    for path in paths:
        with open(path) as f:
            for line in f:
                if '"SparkListenerStageCompleted"' not in line:
                    continue
                ev = json.loads(line)
                mets = ev.get("Stage Info", {}).get("Accumulables", [])
                for m in mets:
                    if m.get("Name") == "internal.metrics.shuffle.write.bytesWritten":
                        wr += int(m.get("Value", 0))
                    elif m.get("Name") == "internal.metrics.shuffle.read.remoteBytesRead":
                        rd += int(m.get("Value", 0))
                    elif m.get("Name") == "internal.metrics.shuffle.read.localBytesRead":
                        rd += int(m.get("Value", 0))
    return wr, rd


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    v = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    which = sys.argv[3] if len(sys.argv) > 3 else "both"
    out: dict = {"cpus": cpus, "vertices": v, "supersteps": SUPERSTEPS, "variants": {}}
    log_dir = tempfile.mkdtemp(prefix="sparkeventlog-")
    spark = get_spark(
        "exchange-bytes",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = synthetic_edges(spark, v).persist()
    n_edges = base.count()
    out["edges"] = n_edges

    variants = {
        "dense": base,
        "hashed": base.select(
            F.xxhash64(F.col("src").cast("string")).alias("src"),
            F.xxhash64(F.col("dst").cast("string")).alias("dst"),
        ),
    }
    if which != "both":
        variants = {which: variants[which]}
    for name, edges in variants.items():
        edges = edges.persist()
        edges.count()
        verts = edges.select(F.col("src").alias("vertex")).union(
            edges.select(F.col("dst").alias("vertex"))
        ).distinct().persist()
        verts.count()
        pagerank(edges, verts, max_iter=2, tol=None)  # warmup
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
        wr0, rd0 = shuffle_bytes_from_eventlog(log_dir)
        res = pagerank(edges, verts, max_iter=SUPERSTEPS, tol=None)
        res.ranks.count()
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
        wr1, rd1 = shuffle_bytes_from_eventlog(log_dir)
        out["variants"][name] = {
            "loop_sec": round(res.loop_sec, 3),
            "edges_per_sec": round(SUPERSTEPS * n_edges / res.loop_sec),
            "shuffle_write_bytes": wr1 - wr0,
            "shuffle_write_bytes_per_edge": round((wr1 - wr0) / (SUPERSTEPS * n_edges), 3),
        }
        verts.unpersist()
        edges.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
