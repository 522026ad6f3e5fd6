"""Explicit skew (hub-vertex) handling: stats pass + salted join.

Web graphs have hub vertices whose key appears in a huge fraction of rows;
a shuffle join on such a key sends all of it to one reducer. Two layers of
defense in this engine:

1. Implicit (always on): map-side partial aggregation for groupBy sums and
   AQE skew-join splitting (session.py).
2. Explicit (this module): a stats pass identifies hot keys (the engine
   analogue of the reference's symbol-frequency stats pass that drives its
   encoding-parameter search, model4encoder_builder.rs:67-271), then a
   salted join spreads each hot key over ``k`` salt buckets: the big side
   gets a deterministic salt per row, the small side is replicated k ways.
   Result is row-identical to the plain join.

Use the explicit path when one key exceeds what a single executor's memory
can hold — at 1e12-document scale a top hub can receive ~1% of all edges,
far beyond a 2 GB shuffle block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def hot_keys(df: DataFrame, key: str, min_count: int) -> DataFrame:
    """Stats pass: keys whose row count exceeds ``min_count``.
    One aggregation; cache the (small) result and broadcast it."""
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > min_count)
        .select(key)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot: DataFrame,
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Inner-join ``big ⋈ small`` on ``key`` with hot keys salted.

    ``big`` rows with a hot key get salt = xxhash64(whole row) % salt;
    ``small`` rows with a hot key are replicated across all salt values.
    Cold keys join with salt 0 on both sides — a single plan, no union of
    two joins, so Catalyst still sees one equi-join on (key, _salt).
    """
    hot_flag = F.broadcast(hot.withColumn("_hot", F.lit(True)))
    big_s = (
        big.join(hot_flag, key, "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_hot").isNotNull(),
                F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)),
            ).otherwise(F.lit(0)),
        )
        .drop("_hot")
    )
    small_s = (
        small.join(hot_flag, key, "left")
        .withColumn(
            "_salts",
            F.when(
                F.col("_hot").isNotNull(),
                F.sequence(F.lit(0), F.lit(salt - 1)),
            ).otherwise(F.array(F.lit(0))),
        )
        .drop("_hot")
        .withColumn("_salt", F.explode("_salts"))
        .drop("_salts")
    )
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")


def salted_count(df: DataFrame, key: str, salt: int = DEFAULT_SALT) -> DataFrame:
    """Two-stage count for pathologically hot keys: partial count per
    (key, salt), then final sum per key. Equivalent to groupBy(key).count()
    — kept explicit for cases where even map-side combine leaves too many
    partials on one reducer (e.g. collect-style aggregations)."""
    return (
        df.withColumn("_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt)))
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").cast("long").alias("count"))
    )
