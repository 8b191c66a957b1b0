"""Advanced relational surface: lateral joins, higher-order functions,
window value functions, grouping markers, struct ops."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.fixtures import load_table, register_views
from .registry import register


@register(
    "lateral_topn",
    oracle="""
    SELECT s.s_suppkey, t.l_orderkey, t.l_quantity
    FROM supplier s,
    LATERAL (SELECT l_orderkey, l_quantity FROM lineitem l
             WHERE l.l_suppkey = s.s_suppkey
             ORDER BY l_quantity DESC, l_orderkey LIMIT 2) t
    """,
)
def lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery with per-row ORDER BY/LIMIT — the
    SQL-standard spelling of per-group top-n (Catalyst de-correlates it
    to the same window-rank plan as window_topk_per_group)."""
    register_views(spark, sf_dir, ["supplier", "lineitem"])
    return spark.sql(
        """
        SELECT s.s_suppkey, t.l_orderkey, t.l_quantity
        FROM supplier s,
        LATERAL (SELECT l_orderkey, l_quantity FROM lineitem l
                 WHERE l.l_suppkey = s.s_suppkey
                 ORDER BY l_quantity DESC, l_orderkey LIMIT 2) t
        """
    )


@register(
    "hof_funcs",
    oracle="""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 200)
    SELECT vec_id,
           len(list_filter(v, x -> x > 0.1)) > 0 AS any_big,
           len(list_filter(v, x -> x > -10.0)) = len(v) AS all_sane,
           ROUND(list_sum(list_transform(v, x -> abs(x))), 6) AS l1_norm,
           ROUND(list_max(list_transform(v, x -> x * 2.0)), 6) AS max_doubled
    FROM base
    """,
)
def hof_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions: exists / forall / transform+aggregate —
    all inside codegen (the lambda surface SURVEY §2 Part B arrays).
    DuckDB spells exists/forall as filter-length tests."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    v = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.exists(v, lambda x: x > 0.1).alias("any_big"),
        F.forall(v, lambda x: x > -10.0).alias("all_sane"),
        F.round(
            F.aggregate(v, F.lit(0.0), lambda acc, x: acc + F.abs(x)), 6
        ).alias("l1_norm"),
        F.round(F.array_max(F.transform(v, lambda x: x * 2.0)), 6).alias(
            "max_doubled"
        ),
    )


@register(
    "window_value_funcs",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING) AS last_order,
           nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND UNBOUNDED FOLLOWING) AS second_order
    FROM orders WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_value_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value with explicit full frames
    (last/nth need UNBOUNDED FOLLOWING to see the whole partition)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    wg = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = wg.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(wg).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_order"),
    )


@register(
    "agg_grouping_marker",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_grouping_marker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() markers distinguishing real NULL keys from subtotal
    rows in rollup output (the metadata companion to agg_rollup)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            F.col("g_flag").cast("int").alias("g_flag"),
            F.col("g_status").cast("int").alias("g_status"),
            "n",
        )
    )


@register(
    "struct_funcs",
    oracle="""
    WITH s AS (
      SELECT c_custkey,
             {'name': c_name, 'balance': c_acctbal, 'nation': c_nationkey} AS profile
      FROM customer WHERE c_custkey < 300)
    SELECT c_custkey,
           profile.name AS pname,
           profile.balance AS pbalance,
           profile.nation AS pnation,
           profile.balance > 5000 AS is_rich
    FROM s
    """,
)
def struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + field access (nested types surface):
    build a struct column, then project fields and predicates off it —
    Catalyst collapses the round-trip, so nesting costs nothing."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    s = c.select(
        "c_custkey",
        F.struct(
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("balance"),
            F.col("c_nationkey").alias("nation"),
        ).alias("profile"),
    )
    return s.select(
        "c_custkey",
        F.col("profile.name").alias("pname"),
        F.col("profile.balance").alias("pbalance"),
        F.col("profile.nation").alias("pnation"),
        (F.col("profile.balance") > 5000).alias("is_rich"),
    )


_RECURSIVE_CLOSURE_SQL = """
    WITH RECURSIVE base AS (
      SELECT doc_id FROM documents WHERE doc_id < 100),
    edges AS (
      SELECT doc_id AS s, doc_id + 10000 AS d FROM base
      UNION ALL
      SELECT doc_id + 10000, doc_id + 20000 FROM base),
    reach AS (
      SELECT doc_id AS root, doc_id AS node, 0 AS depth FROM base
      UNION ALL
      SELECT reach.root, e.d, reach.depth + 1
      FROM reach JOIN edges e ON e.s = reach.node)
    SELECT root, node, depth FROM reach
"""


@register("recursive_closure", oracle=_RECURSIVE_CLOSURE_SQL)
def recursive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, Spark 4.x): data-driven transitive
    closure with depth over the acyclic doc-derivation graph (base ->
    80% copy -> 64% copy, the same planted lineage the dedup fixtures
    use).  The IDENTICAL SQL text runs on Spark and DuckDB — the one
    relational construct the engine surface gained in Spark 4 that the
    iterative DataFrame loop (operators/graph.py) previously stood in
    for.  Spark executes each recursion step as a join against the
    prior frontier only (UNION ALL semantics; termination from the
    DAG), the same per-round shuffle shape as the hand-written loop —
    use the loop for cyclic graphs (UNION-dedup recursion is
    unsupported) and the CTE for hierarchies/DAGs."""
    register_views(spark, sf_dir, ["documents"])
    return spark.sql(_RECURSIVE_CLOSURE_SQL)
