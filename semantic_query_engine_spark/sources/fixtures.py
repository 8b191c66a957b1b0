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
from pyspark.sql import functions as F

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
    # Timestamp rendering must match the DuckDB oracle's naive wall-clock
    # regardless of the host session's default timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read nanos as long and floor-divide to micros
        # with integer `div` (a float path would lose precision above
        # 2^53).  DuckDB also truncates nanos->micros, so both engines
        # see identical values.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register fixture tables as temp views for the SQL API path."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
