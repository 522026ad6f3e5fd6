"""spark-submit entry: PageRank over an edge or adjacency table, resumable.

Usage:
  spark-submit --py-files engine.zip jobs/run_pagerank.py \
      --adj /data/adj --out /data/ranks --checkpoint /data/ckpt \
      --max-iter 50 --tol 1e-6
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from webgraph_ans_rs_spark.checkpoint import CheckpointManager
from webgraph_ans_rs_spark.operators.pagerank import pagerank
from webgraph_ans_rs_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--adj", help="CSR adjacency parquet (src, dsts, outdeg)")
    ap.add_argument("--edges", help="edge parquet (src, dst)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", help="checkpoint root for resumable runs")
    ap.add_argument("--max-iter", type=int, default=50)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument(
        "--no-layout",
        action="store_true",
        help="skip the stats pass; use session defaults (no segmentation)",
    )
    ap.add_argument(
        "--dense-relabel",
        action="store_true",
        help="relabel to dense 0..N-1 ids for the loop and map ranks back"
        " (for xxhash64-id graphs: 29%% fewer bytes through the gather"
        " exchange per superstep — BENCH_EXCHANGE.json)",
    )
    args = ap.parse_args()

    spark = get_spark("run-pagerank")
    if args.adj:
        adj = spark.read.parquet(args.adj)
        edges = adj.select("src", F.explode("dsts").alias("dst"))
    else:
        edges = spark.read.parquet(args.edges)
    verts = (
        edges.select(F.col("src").alias("vertex"))
        .union(edges.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    cm = CheckpointManager(spark, args.checkpoint) if args.checkpoint else None

    # stats pass → physical layout parameters (the reference's two-pass
    # stats-then-encode shape, model4encoder_builder.rs:80-271): shuffle
    # partition count from edge volume, CSR segmentation if hub sources
    layout_kw: dict = {}
    layout_info = None
    if not args.no_layout:
        from webgraph_ans_rs_spark.plans.layout import choose_layout, degree_stats

        cores = spark.sparkContext.defaultParallelism
        plan = choose_layout(degree_stats(edges), total_cores=cores)
        layout_kw = {
            "shuffle_partitions": plan.shuffle_partitions,
            "max_segment": plan.csr_max_segment,
        }
        layout_info = {
            "shuffle_partitions": plan.shuffle_partitions,
            "csr_max_segment": plan.csr_max_segment,
            "max_degree": plan.max_degree,
            "salt_factor": plan.salt_factor,
        }
    res = pagerank(edges, verts, max_iter=args.max_iter, tol=args.tol,
                   checkpoint_manager=cm, dense_relabel=args.dense_relabel,
                   **layout_kw)
    res.ranks.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"iterations": res.iterations, "l1_delta": res.l1_delta,
                      "layout": layout_info, "history": res.history}))


if __name__ == "__main__":
    main()
