"""General relational queries over the TPC-H-ish testdata — demonstrates the
engine's host (Spark SQL) relational surface alongside the graph operators.

The reference has no relational machinery (SURVEY.md §2.A: "no joins,
aggregations beyond frequency counting, ..."); everything here is Catalyst
built-in. Kept thin on purpose: the value is the scan-pruned, partial-agg
plans Catalyst produces, mirrored by DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: grouped pricing aggregates with map-side partials.
    All sums rounded 6dp for cross-engine comparison."""
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.round(F.sum(disc_price), 6).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def top_customers_by_spend(orders: DataFrame, customer: DataFrame, k: int = 20) -> DataFrame:
    """Broadcast-joined top-k spenders; deterministic (total, key) ordering."""
    spend = orders.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 6).alias("total_spend"))
    joined = spend.join(F.broadcast(customer.select("c_custkey", "c_name")),
                        spend["o_custkey"] == F.col("c_custkey"))
    return (
        joined.select(F.col("o_custkey").alias("custkey"), "c_name", "total_spend")
        .orderBy(F.desc("total_spend"), F.asc("custkey"))
        .limit(k)
    )


def events_hourly(events: DataFrame) -> DataFrame:
    """Batch twin of streaming.windows.windowed_event_counts — identical
    semantics, oracle-checkable."""
    from ..streaming.windows import windowed_event_counts

    return windowed_event_counts(events)
