"""One scaling-protocol measurement at a single parallelism level.

Prints one JSON line:
  {"cpus": N, "pagerank_loop_sec_median": ..., "extract_sec_median": ..., ...}

PageRank: bench graph built once (untimed), one warmup run, then 3 measured
runs of the 5-superstep loop; median reported (the reference's protocol is
median-of-10 for its ns/arc numbers, script.py:123-142). Extraction: pages
corpus written once (untimed), 3 measured parse+edge-build runs, median.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from webgraph_ans_rs_spark.datagen import synthetic_pages  # noqa: E402
from webgraph_ans_rs_spark.operators.extract import extract_text_and_links  # noqa: E402
from webgraph_ans_rs_spark.operators.graph_build import edges_from_pages  # noqa: E402
from webgraph_ans_rs_spark.operators.pagerank import pagerank  # noqa: E402
from webgraph_ans_rs_spark.plans.bench_graph import synthetic_edges  # noqa: E402
from webgraph_ans_rs_spark.session import get_spark  # noqa: E402

REPEATS = int(os.environ.get("SPARK_GRAFT_WORKER_REPEATS", "3"))
SUPERSTEPS = 5
V = int(os.environ.get("SPARK_GRAFT_BENCH_VERTICES", "2000000"))
PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "40000"))
DO_EXTRACT = os.environ.get("SPARK_GRAFT_WORKER_EXTRACT", "1") == "1"
# HASHED=1: run the loop over full-entropy xxhash64 ids instead of dense —
# the id-entropy/bandwidth-sensitivity experiment (BENCH_EXCHANGE.json)
HASHED = os.environ.get("SPARK_GRAFT_WORKER_HASHED", "0") == "1"


def main() -> None:
    cpus = int(sys.argv[1])
    spark = get_spark("scaling-worker", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    edges = synthetic_edges(spark, V)
    if HASHED:
        edges = edges.select(
            F.xxhash64(F.col("src").cast("string")).alias("src"),
            F.xxhash64(F.col("dst").cast("string")).alias("dst"),
        )
    edges = edges.persist()
    n_edges = edges.count()
    if HASHED:
        verts = (
            edges.select(F.col("src").alias("vertex"))
            .union(edges.select(F.col("dst").alias("vertex")))
            .distinct()
            .persist()
        )
        verts.count()
    else:
        verts = spark.range(0, V).select(F.col("id").alias("vertex"))

    pagerank(edges, verts, max_iter=2, tol=None)  # warmup (JIT, workers)
    loops = []
    for _ in range(REPEATS):
        res = pagerank(edges, verts, max_iter=SUPERSTEPS, tol=None)
        res.ranks.count()
        loops.append(res.loop_sec)
    loop_med = statistics.median(loops)

    exts = [float("nan")]
    if DO_EXTRACT:
        with tempfile.TemporaryDirectory() as tmp:
            p = os.path.join(tmp, "pages.parquet")
            synthetic_pages(spark, PAGES).write.mode("overwrite").parquet(p)
            pages = spark.read.parquet(p)
            exts = []
            edges_from_pages(extract_text_and_links(pages)).count()  # warmup
            for _ in range(REPEATS):
                t0 = time.time()
                edges_from_pages(extract_text_and_links(pages)).count()
                exts.append(time.time() - t0)
    ext_med = statistics.median(exts)

    print(
        json.dumps(
            {
                "cpus": cpus,
                "pagerank_edges": n_edges,
                "supersteps": SUPERSTEPS,
                "pagerank_loop_secs": [round(x, 3) for x in loops],
                "pagerank_loop_sec_median": round(loop_med, 3),
                "pagerank_edges_per_sec": round(SUPERSTEPS * n_edges / loop_med),
                "pages": PAGES,
                "extract_secs": [round(x, 3) for x in exts] if DO_EXTRACT else [],
                "extract_sec_median": round(ext_med, 3) if DO_EXTRACT else None,
                "pages_per_sec": round(PAGES / ext_med) if DO_EXTRACT else None,
            }
        )
    )


if __name__ == "__main__":
    main()
