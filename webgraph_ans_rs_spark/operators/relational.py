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


def _dsum(col) -> F.Column:
    """Order- and engine-independent sum of a per-row money expression.

    Float sums over enough rows diverge between engines/partitionings
    faster than any fixed rounding absorbs (seen at sf0.1: Spark's
    distributed partials vs DuckDB's sequential fold differed in the 6th
    decimal over 2.5M rows), and even double→decimal CASTs disagree at the
    10th decimal between engines. So: per-row value → micro-units
    (round(x·1e6) — exact, because the true money values have ≤4 decimal
    digits and the double error ~1e-6 relative can never reach the 0.5
    boundary of an integer-valued target) → decimal(38,0) sum (exact,
    overflow-free at any scale). Callers divide by 1e6 once at the end.
    This is also simply the right call for money columns at 100 TB."""
    return F.sum(F.round(col * F.lit(1e6), 0).cast("decimal(38,0)"))


def _dval(sum_col, divisor=None) -> F.Column:
    """Micro-unit sum back to a rounded double value."""
    v = sum_col.cast("double") / F.lit(1e6)
    if divisor is not None:
        v = v / divisor
    return F.round(v, 6)


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: grouped pricing aggregates with map-side partials.
    Decimal-exact sums (see _dsum), rounded 6dp for cross-engine hashing."""
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    n = F.count("*")
    qty = _dsum(F.col("l_quantity"))
    disc = _dsum(F.col("l_discount"))
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dval(qty).alias("sum_qty"),
            _dval(_dsum(F.col("l_extendedprice"))).alias("sum_base_price"),
            _dval(_dsum(disc_price)).alias("sum_disc_price"),
            _dval(qty, n).alias("avg_qty"),
            _dval(disc, n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


def top_customers_by_spend(orders: DataFrame, customer: DataFrame, k: int = 20) -> DataFrame:
    """Broadcast-joined top-k spenders; deterministic (total, key) ordering."""
    spend = orders.groupBy("o_custkey").agg(
        _dval(_dsum(F.col("o_totalprice"))).alias("total_spend")
    )
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
