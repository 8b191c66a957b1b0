"""Fixture table loaders (TESTDATA.md).

The reference scans a directory of PMC*.txt files with a name filter
(/root/reference/app/main.py:427-438, SURVEY A3); the Spark-native analog
is a declarative `spark.read` whose filters and column projections reach
the scan (Catalyst pushdown).  The driver fixtures are parquet — columnar
at rest, an upgrade over the reference's row-oriented OpenSearch docs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; choose from {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register fixture tables as temp views for the SQL API path."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
