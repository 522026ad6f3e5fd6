"""Skew-handling benchmark: the stats-pass→layout loop demonstrated.

Three graphs, same edge count, 5-superstep PageRank loop each:

  uniform  — the regular synthetic bench graph (control).
  out-hub  — one SOURCE vertex owns ~10% of all edges. Plain CSR puts the
             hub's whole successor array in one row, so one task explodes
             10% of E every superstep (stragglers). The layout chooser
             detects max_outdeg >> hot_key_threshold and sets
             csr_max_segment; build_csr_segments splits the hub across
             ~E/(10·segment) rows → the explode parallelizes.
  in-hub   — one DESTINATION vertex receives ~10% of all edges. No knob
             needed: the gather is a sum aggregation, and Catalyst's
             map-side partial aggregation already two-stages it (each
             upstream partition pre-combines the hub's contributions), so
             plain timing should match the uniform control. Measured here
             as evidence the default plan is already skew-safe on the
             gather side.

Writes BENCH_SKEW.json and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from webgraph_ans_rs_spark.operators.pagerank import pagerank  # noqa: E402
from webgraph_ans_rs_spark.plans.bench_graph import synthetic_edges  # noqa: E402
from webgraph_ans_rs_spark.plans.layout import choose_layout, degree_stats  # noqa: E402
from webgraph_ans_rs_spark.session import get_spark  # noqa: E402

V = int(os.environ.get("SPARK_GRAFT_BENCH_VERTICES", "2000000"))
SUPERSTEPS = 5
REPEATS = int(os.environ.get("SPARK_GRAFT_SKEW_REPEATS", "2"))


def loop_sec(edges, verts, **kw) -> float:
    pagerank(edges, verts, max_iter=2, tol=None, **kw)  # warmup (JIT, codegen)
    best = float("inf")
    for _ in range(REPEATS):
        res = pagerank(edges, verts, max_iter=SUPERSTEPS, tol=None, **kw)
        res.ranks.count()
        best = min(best, res.loop_sec)
    return round(best, 3)


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_spark("bench-skew", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    verts = spark.range(0, V).select(F.col("id").alias("vertex"))

    base = synthetic_edges(spark, V)
    n_base = base.count()
    # hub owns ~V-1 edges ≈ 20-25% of the total: one vertex whose scatter
    # fan-out would otherwise run inside a single explode task
    hub_out = base.unionAll(
        spark.range(1, V).select(F.lit(0).alias("src"), F.col("id").alias("dst"))
    ).dropDuplicates(["src", "dst"])
    hub_in = base.unionAll(
        spark.range(1, V).select(F.col("id").alias("src"), F.lit(0).alias("dst"))
    ).dropDuplicates(["src", "dst"])

    out: dict = {"vertices": V, "supersteps": SUPERSTEPS, "cpus": int(cpus)}

    uni = base.persist(); uni.count()
    out["uniform"] = {"edges": n_base, "loop_sec_plain": loop_sec(uni, verts)}
    uni.unpersist()

    ho = hub_out.persist(); n_ho = ho.count()
    stats = degree_stats(ho)
    plan = choose_layout(stats, total_cores=int(cpus))
    out["out_hub"] = {
        "edges": n_ho,
        "hub_outdeg": stats["max_outdeg"],
        "layout_csr_max_segment": plan.csr_max_segment,
        "loop_sec_plain": loop_sec(ho, verts),
        "loop_sec_segmented": loop_sec(ho, verts, max_segment=plan.csr_max_segment),
    }
    out["out_hub"]["speedup"] = round(
        out["out_hub"]["loop_sec_plain"] / out["out_hub"]["loop_sec_segmented"], 3
    )
    ho.unpersist()

    hi = hub_in.persist(); n_hi = hi.count()
    out["in_hub"] = {
        "edges": n_hi,
        "hub_indeg": degree_stats(hi)["max_indeg"],
        "loop_sec_plain": loop_sec(hi, verts),
        "note": "sum-gather is covered by map-side partial aggregation; "
        "expect parity with uniform control",
    }
    hi.unpersist()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_SKEW.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
