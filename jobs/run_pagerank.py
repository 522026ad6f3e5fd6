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
    res = pagerank(edges, verts, max_iter=args.max_iter, tol=args.tol,
                   checkpoint_manager=cm)
    res.ranks.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"iterations": res.iterations, "l1_delta": res.l1_delta,
                      "history": res.history}))


if __name__ == "__main__":
    main()
