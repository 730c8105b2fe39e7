"""Table IO helpers.

Batch scans of the driver testdata star schema (SURVEY.md §2.1 S1): one
``spark.read.parquet`` per table — an Iceberg catalog slots in here
(``spark.read.format('iceberg').load(...)``) when its runtime jar is present
on the cluster; none is bundled with local pyspark, so parquet is the tested
fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
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
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
