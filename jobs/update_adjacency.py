"""spark-submit entry: recrawl delta → copy-on-write adjacency merge.

The incremental counterpart of jobs/build_adjacency.py: where the
reference must re-run its whole compression pipeline for any change
(static artifact, /root/reference/src/bvgraph/random_access.rs:91-222),
this job rewrites ONLY the buckets containing re-crawled sources and
commits a new snapshot that inherits every untouched leaf (Iceberg
REPLACE-PARTITIONS model, sources/catalog.py).

Usage:
  # initial full snapshot
  spark-submit jobs/update_adjacency.py --table /data/cat --name adj \
      --full-from-pages /data/pages.parquet --buckets 16
  # daily delta: pages re-crawled today (complete new outlink sets)
  spark-submit jobs/update_adjacency.py --table /data/cat --name adj \
      --delta-pages /data/recrawl.parquet [--removed /data/gone.parquet]
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
    choose_bucket_count,
    edges_from_pages,
)
from webgraph_ans_rs_spark.operators.incremental import (
    commit_adjacency_partitioned,
    merge_adjacency,
)
from webgraph_ans_rs_spark.session import get_spark
from webgraph_ans_rs_spark.sources.catalog import VersionedTable


def _edges_of(spark, pages_path: str | None, synth: int):
    pages = (
        synthetic_pages(spark, synth) if synth else spark.read.parquet(pages_path)
    )
    return edges_from_pages(extract_text_and_links(pages))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="catalog root dir")
    ap.add_argument("--name", default="adj", help="table name in the catalog")
    ap.add_argument("--full-from-pages", help="pages parquet for an initial full snapshot")
    ap.add_argument("--delta-pages", help="re-crawled pages parquet (complete outlink sets)")
    ap.add_argument("--removed", help="parquet of deleted page urls (column `url`)")
    ap.add_argument("--buckets", type=int, default=0)
    ap.add_argument("--synthetic-pages", type=int, default=0)
    args = ap.parse_args()

    spark = get_spark("update-adjacency")
    table = VersionedTable(spark, args.table, args.name)
    if args.full_from_pages or (args.synthetic_pages and not args.delta_pages):
        edges = _edges_of(spark, args.full_from_pages, args.synthetic_pages)
        buckets = args.buckets or choose_bucket_count(edges.count())
        sid = commit_adjacency_partitioned(table, edges, buckets)
        action = "full"
    elif args.delta_pages:
        edges = _edges_of(spark, args.delta_pages, 0)
        removed = (
            spark.read.parquet(args.removed).select(
                F.xxhash64("url").alias("src")
            )
            if args.removed
            else None
        )
        sid = merge_adjacency(spark, table, edges, removed_srcs=removed)
        action = "delta"
    else:
        raise SystemExit("need --full-from-pages or --delta-pages")
    m = table.manifest(sid)
    print(
        json.dumps(
            {
                "action": action,
                "snapshot_id": sid,
                "rows": m["rows"],
                "replaced_buckets": m.get("replaced"),
                "num_buckets": m["properties"].get("num_buckets"),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
