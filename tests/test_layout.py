from __future__ import annotations

from webgraph_ans_rs_spark.plans.layout import choose_layout, degree_stats


def test_degree_stats_and_layout(spark):
    rows = [(i, i % 10) for i in range(2000)] + [(i, 7) for i in range(2000)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    stats = degree_stats(edges)
    assert stats["num_edges"] == 4000
    assert stats["max_indeg"] >= 2000  # key 7 is hot
    plan = choose_layout(stats, total_cores=8, target_rows_per_partition=500)
    assert plan.salt_factor > 1  # hot key detected → salting engaged
    assert plan.shuffle_partitions >= 16


def test_layout_webscale_numbers():
    """100 TB-ish: 4e10 edges → sane bucket/partition counts."""
    plan = choose_layout(
        {"num_edges": 40_000_000_000, "num_src": 1_000_000_000,
         "num_dst": 1_000_000_000, "max_indeg": 400_000_000},
        total_cores=4000,
    )
    assert plan.buckets == 16384
    assert plan.shuffle_partitions == 20000
    assert plan.salt_factor == 64  # capped
