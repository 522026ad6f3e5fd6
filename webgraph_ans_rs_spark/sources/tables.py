"""Parquet table loaders for the driver-generated testdata.

One parquet file per table under ``{sf_dir}/{name}.parquet`` (TESTDATA.md).
Loading stays lazy — Catalyst prunes columns and pushes filters into the
parquet scan, which is the engine's substitute for the reference's
Elias-Fano pointer index (SURVEY.md §1.6).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
