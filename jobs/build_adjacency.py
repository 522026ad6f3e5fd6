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
    ap.add_argument(
        "--layout",
        choices=["csr", "dense", "gaps"],
        default="csr",
        help="csr: hashed-id CSR (random access by original id); dense:"
        " URL-ordered dense 0..N-1 relabel (crawl locality preserved);"
        " gaps: dense + gap-coded successor lists ([first-src, gap...],"
        " the BV-residual layout — smallest on disk, decode_gaps to read)",
    )
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

    if args.layout in ("dense", "gaps"):
        # URL-ordered dense relabel: rank URLs, not hashes — crawl/host
        # locality survives into the id space, which is what makes gap
        # coding bite (BENCH_r03 storage.locality; WebGraph numbers nodes
        # in lexicographic URL order for the same reason)
        from webgraph_ans_rs_spark.operators.graph_build import dense_ids

        urls = extracted.select(F.col("url")).union(
            extracted.select(F.explode("outlinks").alias("url"))
        ).distinct()
        # dense_ids ranks by URL (returns vertex=url, dense_id); hash the
        # url afterwards to key the map by the edge table's vertex ids
        ids = (
            dense_ids(urls, col="url")
            .select(F.xxhash64("vertex").alias("vertex"), "dense_id")
            .persist()
        )
        edges = (
            edges.join(
                ids.select(F.col("vertex").alias("src"), F.col("dense_id").alias("s")),
                "src",
            )
            .join(
                ids.select(F.col("vertex").alias("dst"), F.col("dense_id").alias("d")),
                "dst",
            )
            .select(F.col("s").alias("src"), F.col("d").alias("dst"))
            .persist()
        )
        ids.select(F.col("vertex").alias("hashed_id"), "dense_id").write.mode(
            "overwrite"
        ).parquet(f"{args.out}_idmap")

    adj = build_csr_adjacency(edges, buckets)
    out_df = adj
    write_opts = {}
    if args.layout == "gaps":
        from webgraph_ans_rs_spark.operators.graph_build import encode_gaps

        out_df = encode_gaps(adj, int_gaps=True)
        write_opts["parquet.writer.version"] = "v2"
    w = out_df.repartition(buckets, "src").sortWithinPartitions("src").write.mode(
        "overwrite"
    )
    for k, v in write_opts.items():
        w = w.option(k, v)
    w.parquet(args.out)

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
