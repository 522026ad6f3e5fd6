"""spark-submit entry: the full link-analysis suite over an edge or
adjacency table — every non-PageRank kernel a reference user runs on a
stored graph, in one pass over cached edges.

Kernels (each an --only selectable step, all written as parquet under
--out/<name>):
  components     small/large-star connected components
  scc            strongly connected components (trim + coloring + sweep)
  labelprop      synchronous label propagation (--lp-iters)
  labelprop_converged  run-to-stability LP (self-vote damping; raises
                 if --lp-max-iter supersteps pass without stabilizing)
  hits           hubs & authorities (single-exchange CSR half-steps)
  degrees        out/in degree tables + degree distribution
  kcore          k-core peel at --k
  triangles      per-vertex triangle counts + the transitivity statistic
  adamic_adar    top --top-n link predictions (center cap --aa-cap)
  neighborhood   HyperBall NF estimates + harmonic centrality at --hb-p
                 (packed register layout)
  betweenness    sampled --bt-depth-bounded Brandes from the
                 vertex %% --bt-seed-mod == 0 seed set
  stats          global structural summary (density, self-loops,
                 reciprocity, out-in degree assortativity)

Usage:
  spark-submit --py-files engine.zip jobs/analyze_graph.py \
      --edges /data/edges.parquet --out /data/analysis \
      --only hits,kcore,transitivity --k 12

The reference's analogue is its example/bench binaries iterating a
loaded BvGraph (examples/*.rs); here every kernel is a Catalyst plan
over the same cached edge frame.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from webgraph_ans_rs_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--adj", help="CSR adjacency parquet (src, dsts, ...)")
    ap.add_argument("--edges", help="edge parquet (src, dst)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--only", help="comma list of kernels (default: all)")
    ap.add_argument("--k", type=int, default=3, help="k for kcore")
    ap.add_argument("--lp-iters", type=int, default=2)
    ap.add_argument("--lp-max-iter", type=int, default=32,
                    help="stability bound for labelprop_converged")
    ap.add_argument("--hits-iters", type=int, default=3)
    ap.add_argument("--hb-p", type=int, default=8)
    ap.add_argument("--hb-t", type=int, default=4)
    ap.add_argument("--top-n", type=int, default=200)
    ap.add_argument("--aa-cap", type=int, default=64)
    ap.add_argument("--bt-seed-mod", type=int, default=101,
                    help="betweenness seed set = vertex %% bt-seed-mod == 0")
    ap.add_argument("--bt-depth", type=int, default=4,
                    help="betweenness shortest-path truncation depth")
    args = ap.parse_args()

    spark = get_spark("analyze-graph")
    if args.adj:
        adj = spark.read.parquet(args.adj)
        edges = adj.select("src", F.explode("dsts").alias("dst"))
    elif args.edges:
        edges = spark.read.parquet(args.edges).select("src", "dst")
    else:
        ap.error("one of --adj / --edges is required")
    edges = edges.persist()
    verts = (
        edges.select(F.col("src").alias("vertex"))
        .union(edges.select(F.col("dst").alias("vertex")))
        .distinct()
        .persist()
    )

    steps = {}

    def step(name, fn):
        steps[name] = fn

    from webgraph_ans_rs_spark.operators.components import connected_components
    from webgraph_ans_rs_spark.operators.degrees import (
        degree_distribution,
        indegrees,
        outdegrees,
    )
    from webgraph_ans_rs_spark.operators.hits import hits
    from webgraph_ans_rs_spark.operators.kcore import kcore
    from webgraph_ans_rs_spark.operators.labelprop import (
        label_propagation,
        label_propagation_converged,
    )
    from webgraph_ans_rs_spark.operators.linkpred import adamic_adar
    from webgraph_ans_rs_spark.operators.neighborhood import (
        harmonic_centrality_packed,
        hyperball_packed,
    )
    from webgraph_ans_rs_spark.operators.scc import strongly_connected_components
    from webgraph_ans_rs_spark.operators.triangles import (
        transitivity,
        triangles_per_vertex,
    )

    step("components", lambda: connected_components(edges, verts))
    step("scc", lambda: strongly_connected_components(edges, verts))
    step("labelprop", lambda: label_propagation(edges, verts, args.lp_iters))
    step("labelprop_converged", lambda: label_propagation_converged(
        edges, verts, max_iter=args.lp_max_iter)[0])
    step("hits", lambda: hits(edges, verts, num_iter=args.hits_iters))
    step("degrees", lambda: outdegrees(edges, verts).join(
        indegrees(edges, verts), "vertex"))
    step("degree_distribution", lambda: degree_distribution(edges, verts))
    step("kcore", lambda: kcore(edges, k=args.k))
    step("triangles", lambda: triangles_per_vertex(edges, verts))
    step("transitivity", lambda: transitivity(edges))
    step("adamic_adar", lambda: adamic_adar(
        edges, center_cap=args.aa_cap, top_n=args.top_n))
    step("neighborhood", lambda: hyperball_packed(
        edges, verts, args.hb_t, p=args.hb_p))
    step("harmonic", lambda: harmonic_centrality_packed(
        edges, verts, args.hb_t, p=args.hb_p))

    from webgraph_ans_rs_spark.operators.betweenness import betweenness_sampled
    from webgraph_ans_rs_spark.operators.graphstats import graph_global_stats

    step("betweenness", lambda: betweenness_sampled(
        edges,
        verts.where(F.col("vertex") % args.bt_seed_mod == 0),
        args.bt_depth,
    ))
    step("stats", lambda: graph_global_stats(edges, verts))

    selected = (
        [s.strip() for s in args.only.split(",")] if args.only else list(steps)
    )
    unknown = [s for s in selected if s not in steps]
    if unknown:
        ap.error(f"unknown kernels: {unknown}; choose from {sorted(steps)}")

    metrics = {}
    for name in selected:
        t0 = time.time()
        df = steps[name]()
        out = f"{args.out}/{name}"
        df.write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
        metrics[name] = {"rows": n, "sec": round(time.time() - t0, 3)}
        print(f"[analyze] {name}: {n} rows in {metrics[name]['sec']}s -> {out}")
    edges.unpersist()
    verts.unpersist()
    print(json.dumps({"out": args.out, "kernels": metrics}))


if __name__ == "__main__":
    main()
