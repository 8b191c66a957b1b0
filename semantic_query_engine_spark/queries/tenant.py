"""Multi-tenant surface (SURVEY A22/A23,
/root/reference/app/embedding_gen.py:282-409): upload validation,
authorized-user semi-join, per-tenant layout."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table, register_views
from .registry import register

# Deterministic batch timestamp (FIXTURES.md §3: timestamps are passed
# in, never generated) standing in for the reference's unix_ts suffix
# (/root/reference/app/embedding_gen.py:356-358).
BATCH_TS = 1700000000


@register(
    "upload_validation",
    oracle=f"""
    SELECT doc_id,
           doc_id % 10 AS user_id,
           source || '_' || CAST(doc_id AS VARCHAR) || '_' || CAST({BATCH_TS} AS VARCHAR) AS upload_id
    FROM documents
    WHERE source IS NOT NULL AND length(source) > 0 AND starts_with(source, 'src')
      AND text IS NOT NULL AND length(trim(text)) > 0
    """,
)
def upload_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upload validation + doc_id derivation (SURVEY A23,
    /root/reference/app/embedding_gen.py:343-372): non-empty name with
    the expected prefix (the fixture's analog of the .txt extension
    check), non-empty body, derived upload id stem_ts."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(
        F.col("source").isNotNull()
        & (F.length("source") > 0)
        & F.col("source").startswith("src")
        & F.col("text").isNotNull()
        & (F.length(F.trim(F.col("text"))) > 0)
    ).select(
        "doc_id",
        (F.col("doc_id") % 10).alias("user_id"),
        F.concat_ws(
            "_", "source", F.col("doc_id").cast("string"), F.lit(str(BATCH_TS))
        ).alias("upload_id"),
    )


@register(
    "tenant_auth_ingest",
    oracle="""
    WITH uploads AS (
      SELECT doc_id, doc_id % 10 AS user_id FROM documents),
    valid_users AS (
      SELECT DISTINCT c_custkey % 10 AS user_id FROM customer
      WHERE c_acctbal > 0 AND c_name IS NOT NULL AND length(c_name) > 0
        AND c_custkey % 10 < 7)
    SELECT u.user_id, COUNT(*) AS n_docs
    FROM uploads u
    WHERE EXISTS (SELECT 1 FROM valid_users v WHERE v.user_id = u.user_id)
    GROUP BY u.user_id
    """,
)
def tenant_auth_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Authorized-tenant ingest (SURVEY A22,
    /root/reference/app/embedding_gen.py:282-309): the Postgres point
    lookup with non-null/non-empty validation becomes a broadcast
    LEFT SEMI join of uploads against the validated users table; only
    authorized tenants' documents are counted/indexed."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 10).alias("user_id")
    )
    valid = (
        load_table(spark, sf_dir, "customer")
        .filter(
            (F.col("c_acctbal") > 0)
            & F.col("c_name").isNotNull()
            & (F.length("c_name") > 0)
            & (F.col("c_custkey") % 10 < 7)
        )
        .select((F.col("c_custkey") % 10).alias("user_id"))
        .distinct()
    )
    return (
        # bounded: user_id = c_custkey % 10 => at most 10 distinct rows
        docs.join(F.broadcast(valid), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "in_subquery",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
    """,
)
def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (rewritten to a semi join by Catalyst)."""
    register_views(spark, sf_dir, ["supplier", "nation"])
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        """
    )


@register(
    "scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           ROUND(o_totalprice - (SELECT CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                                 FROM orders) / (100.0 * (SELECT COUNT(*) FROM orders)), 2) AS delta_from_avg
    FROM orders WHERE o_totalprice > 450000
    """,
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (broadcast single-value join) with fixed-point
    average for cross-engine exactness."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               ROUND(o_totalprice - (SELECT SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                                     FROM orders) / (100.0 * (SELECT COUNT(*) FROM orders)), 2) AS delta_from_avg
        FROM orders WHERE o_totalprice > 450000
        """
    )
