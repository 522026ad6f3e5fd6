"""Stats-pass-driven physical layout parameters.

The reference runs a frequency stats pass and then searches encoding
parameters ((fidelity, radix) × frame sizes within bounded regret,
/root/reference/src/ans/model4encoder_builder.rs:80-271). The engine's
analogous knobs are chosen driver-side from one degree-histogram pass:

  * bucket count     — adjacency table buckets sized for ~target bytes
  * shuffle partitions — 2-3× total cores, at least edges/target rows
  * salt factor      — from the hottest key's share of rows
  * hot-key threshold — keys too big for one shuffle partition

Plain Python over a ~100-row histogram: no Catalyst extension needed
(SURVEY.md §4.3).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class LayoutPlan:
    num_edges: int
    num_vertices: int
    max_degree: int
    buckets: int
    shuffle_partitions: int
    hot_key_threshold: int
    salt_factor: int
    # CSR successor-list segment cap (None = no hub sources detected):
    # feeds pagerank(max_segment=…) / build_csr_segments so no task ever
    # explodes a hub's whole fan-out
    csr_max_segment: int | None = None


def degree_stats(edges: DataFrame) -> dict:
    """One aggregation pass per side: edge count, distinct sources, max of
    the hottest destination (in-degree drives gather skew) and hottest
    source (out-degree drives scatter/explode skew → CSR segmentation)."""
    agg = edges.agg(
        F.count("*").alias("num_edges"),
        F.approx_count_distinct("src").alias("num_src"),
    ).first()
    top = (
        edges.groupBy("dst")
        .agg(F.count("*").alias("c"))
        .agg(F.max("c").alias("max_indeg"), F.count("*").alias("num_dst"))
        .first()
    )
    top_out = (
        edges.groupBy("src")
        .agg(F.count("*").alias("c"))
        .agg(F.max("c").alias("max_outdeg"))
        .first()
    )
    return {
        "num_edges": agg.num_edges,
        "num_src": agg.num_src,
        "num_dst": top.num_dst,
        "max_indeg": top.max_indeg,
        "max_outdeg": top_out.max_outdeg,
    }


def choose_layout(
    stats: dict,
    total_cores: int = 32,
    target_edges_per_bucket: int = 4_000_000,
    target_rows_per_partition: int = 2_000_000,
) -> LayoutPlan:
    e = stats["num_edges"]
    v = max(stats["num_src"], stats["num_dst"])
    buckets = max(1, 2 ** math.ceil(math.log2(max(1, e / target_edges_per_bucket))))
    shuffle = max(2 * total_cores, math.ceil(e / target_rows_per_partition))
    # a key is "hot" if a single reducer partition would be dominated by it
    hot_threshold = max(1, e // shuffle)
    max_indeg = stats["max_indeg"]
    salt = 1
    if max_indeg > hot_threshold:
        salt = min(64, 2 ** math.ceil(math.log2(max_indeg / hot_threshold)))
    # hub SOURCES: cap CSR successor segments at one reducer-partition's
    # worth so the scatter explode parallelizes across the hub's fan-out
    max_outdeg = stats.get("max_outdeg") or 0
    csr_max_segment = hot_threshold if max_outdeg > hot_threshold else None
    return LayoutPlan(
        num_edges=e,
        num_vertices=v,
        max_degree=max_indeg,
        buckets=buckets,
        shuffle_partitions=shuffle,
        hot_key_threshold=hot_threshold,
        salt_factor=salt,
        csr_max_segment=csr_max_segment,
    )
