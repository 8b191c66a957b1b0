"""Scale-technique queries: the shapes that keep plans alive at 100 TB,
demonstrated on fixtures with exact oracles (the technique must not
change the answer)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table
from .registry import register

SALTS = 8


@register(
    "skew_salted_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_price,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for skewed keys: l_returnflag has
    only 3 values, so a naive groupBy funnels everything into 3 reduce
    tasks.  Salting by a deterministic row attribute fans phase 1 out to
    3*SALTS tasks; phase 2 reduces SALTS partials per key.  The result
    is bit-identical to the direct aggregation (fixed-point cents), and
    the oracle IS the direct aggregation.

    (Spark's partial aggregation already map-side combines; explicit
    salting is the pattern for when the *reduce* side still skews —
    e.g. high-cardinality payloads per hot key, collect_list-style
    aggregates, or pre-AQE engines.)"""
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn("__salt", (F.col("l_orderkey") % SALTS).cast("int"))
    phase1 = salted.groupBy("l_returnflag", "__salt").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("pc"),
        F.count("*").alias("pn"),
    )
    return phase1.groupBy("l_returnflag").agg(
        (F.sum("pc") / 100.0).alias("sum_price"),
        F.sum("pn").alias("n"),
    )


@register(
    "broadcast_dim_join",
    oracle="""
    SELECT n.n_name AS nation, COUNT(*) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join of a fact table against a 25-row
    dimension: zero shuffle of the fact side — the canonical star-schema
    shape (at 100 TB the alternative sort-merge join would shuffle the
    entire fact table)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "repartition_colocate",
    oracle="""
    SELECT l_orderkey, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING COUNT(*) >= 6
    """,
)
def repartition_colocate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit repartition-by-key before aggregation: when a pipeline
    performs SEVERAL key-local operations (agg + join + window on the
    same key), one up-front hash repartition lets every later stage
    reuse the partitioning instead of re-shuffling.  Result is identical
    to the direct plan (oracle = direct SQL)."""
    li = load_table(spark, sf_dir, "lineitem").repartition(32, "l_orderkey")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
        .filter(F.col("n_items") >= 6)
    )
