"""spark-submit entry: pages parquet → bucketed CSR adjacency table.

The engine's analogue of the reference's ``bvcomp`` CLI
(/root/reference/src/bin/bvcomp.rs:24-42 → ANSBvGraph::store): a stats pass
(degree histogram → bucket count), a layout pass (repartition by src +
sorted successor lists), and a serialize step (bucketed parquet, the
stand-in for .ans/.pointers/.states).

Usage:
  spark-submit --py-files engine.zip jobs/build_adjacency.py \
      --pages /data/pages.parquet --out /data/adj --synthetic-pages 0
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from webgraph_ans_rs_spark.datagen import synthetic_pages
from webgraph_ans_rs_spark.operators.extract import extract_text_and_links
from webgraph_ans_rs_spark.operators.graph_build import (
    build_csr_adjacency,
    choose_bucket_count,
    edges_from_pages,
)
from webgraph_ans_rs_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="input pages parquet path")
    ap.add_argument("--synthetic-pages", type=int, default=0,
                    help="generate N synthetic pages instead of reading --pages")
    ap.add_argument("--out", required=True, help="output adjacency table path")
    args = ap.parse_args()

    spark = get_spark("build-adjacency")
    pages = (
        synthetic_pages(spark, args.synthetic_pages)
        if args.synthetic_pages
        else spark.read.parquet(args.pages)
    )
    extracted = extract_text_and_links(pages)
    edges = edges_from_pages(extracted).persist()

    # stats pass (reference: model-builder frequency pass,
    # random_access.rs:105-132) → layout parameter
    n_edges = edges.count()
    buckets = choose_bucket_count(n_edges)
    adj = build_csr_adjacency(edges, buckets)
    adj.repartition(buckets, "src").sortWithinPartitions("src").write.mode(
        "overwrite"
    ).parquet(args.out)

    # storage accounting — the reference's headline metric is bit/link
    # (README.md:99-150); ours is bytes/edge of the written table
    from webgraph_ans_rs_spark.plans.storage import dir_bytes

    table_bytes = dir_bytes(spark, args.out)
    meta = {
        "num_arcs": n_edges,
        "num_nodes": adj.count(),
        "buckets": buckets,
        "max_outdeg": adj.agg(F.max("outdeg")).first()[0],
        "table_bytes": table_bytes,
        "bytes_per_edge": round(table_bytes / n_edges, 3),
        "bits_per_link": round(8.0 * table_bytes / n_edges, 3),
    }
    (Path(args.out) / "_meta.json").write_text(json.dumps(meta))
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
