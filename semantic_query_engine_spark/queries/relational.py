"""Relational operator surface (SURVEY §2 Part B) over the TPC-H-ish
fixtures: joins (all types), aggregation suite (+ rollup/cube/grouping
sets), window functions, sorts/top-k, set ops, pivot, subqueries.

Float determinism: money aggregates use FIXED-POINT accumulation —
prices/discounts/taxes are exact 2-decimal values, so
sum(round(x*100)::bigint) is exact integer arithmetic in BOTH engines
and the final /100.0 is a single identical fp op.  This makes the
value-hash bit-exact instead of hoping rounding hides summation-order
noise (FIXTURES.md §3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.fixtures import load_table, register_views
from .registry import register


def _cents(col: str) -> F.Column:
    """Exact integer cents of a 2-decimal double column."""
    return F.round(F.col(col) * 100).cast("long")


# DuckDB fragment matching _cents
def _dcents(col: str) -> str:
    return f"CAST(round({col} * 100) AS BIGINT)"


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM({_dcents('l_extendedprice')}) AS BIGINT) / 100.0 AS sum_base_price,
           CAST(SUM({_dcents('l_extendedprice')} * (100 - {_dcents('l_discount')})) AS BIGINT) / 10000.0 AS sum_disc_price,
           CAST(SUM({_dcents('l_extendedprice')} * (100 - {_dcents('l_discount')}) * (100 + {_dcents('l_tax')})) AS BIGINT) / 1000000.0 AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_qty,
           ROUND(CAST(SUM({_dcents('l_extendedprice')}) AS BIGINT) / (100.0 * COUNT(*)), 6) AS avg_price,
           ROUND(CAST(SUM({_dcents('l_discount')}) AS BIGINT) / (100.0 * COUNT(*)), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog: the hash-aggregate workhorse (partial+final
    map-side combine; one shuffle keyed on 2 low-cardinality columns)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    price_c, disc_c, tax_c = (
        _cents("l_extendedprice"),
        _cents("l_discount"),
        _cents("l_tax"),
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        (F.sum(price_c) / 100.0).alias("sum_base_price"),
        (F.sum(price_c * (F.lit(100) - disc_c)) / 10000.0).alias("sum_disc_price"),
        (
            F.sum(price_c * (F.lit(100) - disc_c) * (F.lit(100) + tax_c)) / 1000000.0
        ).alias("sum_charge"),
        F.round(
            F.sum(F.col("l_quantity").cast("long")) / F.count("*").cast("double"), 6
        ).alias("avg_qty"),
        F.round(F.sum(price_c) / (F.count("*") * 100.0), 6).alias("avg_price"),
        F.round(F.sum(disc_c) / (F.count("*") * 100.0), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "agg_stats",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_cust,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_bal,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal,
           ROUND(CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) / (100.0 * COUNT(*)), 6) AS avg_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count / count-distinct / sum / min / max / avg in one hash-agg."""
    c = load_table(spark, sf_dir, "customer")
    bal_c = _cents("c_acctbal")
    return c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_cust"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        (F.sum(bal_c) / 100.0).alias("sum_bal"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        F.round(F.sum(bal_c) / (F.count("*") * 100.0), 6).alias("avg_bal"),
    )


@register(
    "agg_minmax_by",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rmax
      FROM orders)
    SELECT o_orderpriority,
           MIN(CASE WHEN rmin = 1 THEN o_orderkey END) AS cheapest_order,
           MIN(CASE WHEN rmax = 1 THEN o_orderkey END) AS priciest_order,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM ranked GROUP BY o_orderpriority
    """,
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by / max_by (the reference's argmin/argmax scans, SURVEY
    A12/A13) with deterministic struct tie-breaks."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.min_by(
            "o_orderkey",
            F.struct(F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k")),
        ).alias("cheapest_order"),
        F.max_by(
            "o_orderkey",
            F.struct(
                F.col("o_totalprice").alias("p"), (-F.col("o_orderkey")).alias("k")
            ),
        ).alias("priciest_order"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (SURVEY §2 Part B aggregations)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
           COALESCE(o_orderpriority, 'ALL') AS orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            (F.sum(_cents("o_totalprice")) / 100.0).alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n",
            "sum_price",
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL API (Catalyst expands to the
    same Expand node as cube/rollup)."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "distinct_count_exact",
    oracle="""
    SELECT COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_pairs
    FROM lineitem
    """,
)
def distinct_count_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts (multi-column included)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_partkey", "l_suppkey").alias("n_pairs"),
    )


@register(
    "distinct_count_approx",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey)::BIGINT AS exact_parts,
           TRUE AS within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
)
def distinct_count_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) PER GROUP — the constant-memory
    distinct for 100 TB corpus stats in its production shape: one
    mergeable sketch per partition key, combined map-side, never a
    per-key exact distinct shuffle.  Error-gated (VERDICT r10 #7,
    closing the last rows-only entries): the raw sketch value cannot be
    value-hashed against DuckDB's different HLL, so the output carries
    the EXACT per-group count plus a `within_tol` boolean (sketch
    within 5% of exact at rsd=0.02) and both go through the value-hash
    gate — the recall_ok pattern the ANN rows use.  HLL merge is
    commutative, so the flag is deterministic under any partitioning.
    Global (ungrouped) twin: distinct_count_checked (stats_q.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    exact = F.countDistinct("l_partkey")
    approx = F.approx_count_distinct("l_partkey", 0.02)
    return li.groupBy("l_returnflag").agg(
        exact.alias("exact_parts"),
        (
            F.abs(approx.cast("double") - exact.cast("double"))
            / exact.cast("double")
            <= 0.05
        ).alias("within_tol"),
    )


@register(
    "having_filter",
    oracle="""
    SELECT l_suppkey, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem GROUP BY l_suppkey
    HAVING COUNT(*) > 550 AND CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) > 14000
    """,
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation predicate (HAVING)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
        .filter((F.col("n_items") > 550) & (F.col("sum_qty") > 14000))
    )


@register(
    "pivot_status",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_open,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_filled
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot as conditional aggregation (explicit value list, map-side
    combinable — scales better than a dynamic pivot's extra pass)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_linestatus") == "O", qty).otherwise(0)).alias("qty_open"),
        F.sum(F.when(F.col("l_linestatus") == "F", qty).otherwise(0)).alias(
            "qty_filled"
        ),
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "join_inner_q3",
    oracle=f"""
    SELECT l.l_orderkey AS orderkey,
           CAST(SUM({_dcents('l.l_extendedprice')} * (100 - {_dcents('l.l_discount')})) AS BIGINT) / 10000.0 AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority AS priority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
)
def join_inner_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: selective dim filter -> 3-way join -> agg ->
    top-10.  The filtered customer side is UN-HINTED: it shrinks 5x
    but still grows linearly with SF (the jaccard_pairs rule — never
    force a broadcast on a data-dependent-size side), so AQE broadcasts
    it at demo scale and shuffle-joins at 100 TB.  lineitem never
    shuffles more than its filtered slice."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    rev_c = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg((F.sum(rev_c) / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
        .select("orderkey", "revenue", "orderdate", "priority")
    )


@register(
    "join_q5_region",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(SUM({_dcents('l.l_extendedprice')} * (100 - {_dcents('l.l_discount')})) AS BIGINT) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND o.o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n.n_name
    """,
)
def join_q5_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analog: the 6-table star join.  region/nation broadcast
    (25/5 rows by schema, SF-invariant); supplier is UN-HINTED because
    it grows linearly with SF — AQE broadcasts it at demo scale and
    shuffle-joins it at 100 TB.  Only the fact tables shuffle, keyed on
    orderkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev_c = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        # bounded: nation/region are 25/5 rows by TPC-H schema, SF-invariant
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg((F.sum(rev_c) / 10000.0).alias("revenue"))
    )


@register(
    "join_left_orders_per_customer",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers with zero orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_right",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM orders o RIGHT JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join (mirror of the left join plan)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(c, c.c_custkey == o.o_custkey, "right")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of per-nation customer vs supplier counts."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("nk_c")).agg(
        F.count("*").alias("n_cust")
    )
    sn = s.groupBy(F.col("s_nationkey").alias("nk_s")).agg(
        F.count("*").alias("n_supp")
    )
    return cn.join(sn, cn.nk_c == sn.nk_s, "full").select(
        F.coalesce("nk_c", "nk_s").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — the reference's auth lookup shape (SURVEY A22,
    /root/reference/app/embedding_gen.py:282-309): keep rows with a
    match, never duplicate."""
    c = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with no orders at all."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    WHERE n.n_regionkey <> r.r_regionkey
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS join with a non-equi residual predicate (theta join)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        r.crossJoin(n)
        .filter(F.col("n_regionkey") != F.col("r_regionkey"))
        .select("r_name", "n_name")
    )


@register(
    "join_range_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (VALUES
      ('small', 0.0, 100000.0),
      ('medium', 100000.0, 300000.0),
      ('large', 300000.0, 1000000.0))
    SELECT b.band, COUNT(*) AS n_orders,
           CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_price
    FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: fact rows land in value intervals via a
    broadcast non-equi join — the dimension is tiny, so the 'range join'
    is a map-only broadcast nested loop, no shuffle of the fact side."""
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("small", 0.0, 100000.0), ("medium", 100000.0, 300000.0), ("large", 300000.0, 1000000.0)],
        "band string, lo double, hi double",
    )
    return (
        o.join(
            # bounded: 3 literal band rows
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(_cents("o_totalprice")) / 100.0).alias("sum_price"),
        )
    )


@register(
    "exists_subquery",
    oracle="""
    SELECT p_partkey, p_name FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)
      AND p.p_size > 40
    """,
)
def exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS via the SQL API (Catalyst rewrites to a semi
    join — same physical plan as join_semi)."""
    register_views(spark, sf_dir, ["part", "lineitem"])
    return spark.sql(
        """
        SELECT p_partkey, p_name FROM part p
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)
          AND p.p_size > 40
        """
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      FROM orders
    ) WHERE rn <= 2
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number — the distributed form of the
    reference's argmax scans (SURVEY A12/A13).  AQE + the window's
    rank-limit pushdown keep per-partition state at k rows."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "window_rank_dense_ntile",
    oracle="""
    SELECT c_custkey, c_acctbal,
           CAST(RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rnk,
           CAST(DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS INT) AS drnk,
           CAST(NTILE(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS INT) AS quartile
    FROM customer
    """,
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over one partitioning (single shuffle,
    one sort serves all three)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(date_diff('day',
             lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             o_orderdate) AS INT) AS days_since_prev,
           lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_orderkey
    FROM orders WHERE o_custkey < 100
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead: inter-order gaps per customer."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
            "days_since_prev"
        ),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0
             AS running_spend,
           AVG(o_totalprice)
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS avg3
    FROM orders WHERE o_custkey < 100
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-based windows: running total (unbounded preceding) and a
    3-row moving average.  Fixed-point keeps the running sum hash-exact;
    the moving avg spans <=3 values so fp noise is sub-round(6)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(_cents("o_totalprice")).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            / 100.0
        ).alias("running_spend"),
        F.avg("o_totalprice")
        .over(w.rowsBetween(-2, Window.currentRow))
        .alias("avg3"),
    )


# ---------------------------------------------------------------------------
# Sorts / top-k / set ops
# ---------------------------------------------------------------------------


@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k -> TakeOrderedAndProject (per-partition heap + k-row
    driver merge; never a full sort)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


@register(
    "sort_multi_col",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    ORDER BY n_regionkey DESC, n_name ASC
    """,
)
def sort_multi_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column global sort (range-partitioned exchange)."""
    n = load_table(spark, sf_dir, "nation")
    return n.orderBy(F.desc("n_regionkey"), F.asc("n_name")).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@register(
    "set_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (no shuffle — pure concatenation of scans)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s)


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics): nations that have both a customer and
    a supplier — one hash-distinct per side plus an equi semi join."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@register(
    "set_except",
    oracle="""
    SELECT DISTINCT l_partkey AS partkey FROM lineitem
    EXCEPT
    SELECT p_partkey FROM part WHERE p_size <= 25
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics): parts that were ordered but are not small
    (p_size > 25) — distinct + anti join, shuffle keyed on partkey."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("partkey")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 25).select(
        F.col("p_partkey").alias("partkey")
    )
    return li.distinct().subtract(p)


@register(
    "unpivot_metrics",
    oracle="""
    SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS value
    FROM orders WHERE o_orderkey < 2000
    UNION ALL
    SELECT o_orderkey, 'custkey' AS metric, CAST(o_custkey AS DOUBLE) AS value
    FROM orders WHERE o_orderkey < 2000
    """,
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide columns -> (key, metric, value) rows via
    DataFrame.unpivot — the Expand-based physical op (no shuffle; output
    rows = input rows x metrics)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    wide = o.select(
        "o_orderkey",
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    )
    return wide.unpivot(
        ids=["o_orderkey"],
        values=["totalprice", "custkey"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "pagination",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 40
    """,
)
def pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET pagination over a deterministic total order (page 3
    of 20).  Spark plans offset+limit together; with a sorted child it
    stays a bounded top-(offset+limit) rather than a full sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(40)
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "set_intersect_all",
    oracle="""
    SELECT l_suppkey AS suppkey FROM lineitem WHERE l_quantity >= 45
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_discount >= 0.08
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset semantics: min of the two multiplicities
    per value) — distinct from the set-semantics `set_intersect`."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 45).select(F.col("l_suppkey").alias("suppkey"))
    b = li.filter(F.col("l_discount") >= 0.08).select(F.col("l_suppkey").alias("suppkey"))
    return a.intersectAll(b)


@register(
    "set_except_all",
    oracle="""
    SELECT l_suppkey AS suppkey FROM lineitem WHERE l_quantity >= 45
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_discount >= 0.08 AND l_quantity >= 49
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference: multiplicity a minus b, floored
    at zero)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 45).select(F.col("l_suppkey").alias("suppkey"))
    b = li.filter((F.col("l_discount") >= 0.08) & (F.col("l_quantity") >= 49)).select(
        F.col("l_suppkey").alias("suppkey")
    )
    return a.exceptAll(b)


@register(
    "order_nulls_last",
    oracle="""
    SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg
    FROM customer
    ORDER BY seg NULLS LAST, c_custkey
    LIMIT 50
    """,
)
def order_nulls_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS LAST ordering (Spark defaults nulls-first for asc;
    DuckDB defaults nulls-last — the explicit clause makes both agree),
    made hash-observable through the LIMIT."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.expr("nullif(c_mktsegment, 'BUILDING')").alias("seg"),
        )
        .orderBy(F.col("seg").asc_nulls_last(), F.asc("c_custkey"))
        .limit(50)
    )


@register(
    "window_dist_funcs",
    oracle="""
    SELECT c_custkey,
           CAST(floor(percent_rank() OVER
             (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) * 1000000) AS BIGINT)
             AS pct_rank_micro,
           CAST(floor(cume_dist() OVER
             (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) * 1000000) AS BIGINT)
             AS cdist_micro
    FROM customer
    """,
)
def window_dist_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank, cume_dist) — the
    remaining ranking family members; one partitioning/sort serves both.
    Projected as fixed-point micro-units via floor: both values are
    small-integer ratios that can land EXACTLY on a round-half boundary
    (e.g. 3330/6400 = 0.5203125), where Spark's HALF_UP and DuckDB's
    rounding disagree at 6 decimals; floor of the identical IEEE double
    is deterministic on both engines."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.asc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        F.floor(F.percent_rank().over(w) * 1000000).cast("long").alias("pct_rank_micro"),
        F.floor(F.cume_dist().over(w) * 1000000).cast("long").alias("cdist_micro"),
    )


@register(
    "null_safe_join",
    oracle="""
    WITH a AS (
      SELECT c_custkey, NULLIF(c_nationkey % 5, 0) AS bucket
      FROM customer),
    d AS (
      SELECT DISTINCT NULLIF(n_nationkey % 5, 0) AS bucket FROM nation)
    SELECT a.bucket, COUNT(*) AS n
    FROM a JOIN d ON a.bucket IS NOT DISTINCT FROM d.bucket
    GROUP BY a.bucket
    """,
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics dimension-table
    joins need when the key is optional.  Catalyst still plans this as an
    equi-join (EqualNullSafe is a valid hash-join key), so it broadcasts
    like any other dim join."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("bucket")
    )
    d = (
        load_table(spark, sf_dir, "nation")
        .select(F.nullif(F.col("n_nationkey") % 5, F.lit(0)).alias("bucket"))
        .distinct()
    )
    return (
        # bounded: distinct of nation-bucket => at most 5 rows
        c.join(F.broadcast(d), c["bucket"].eqNullSafe(d["bucket"]))
        .groupBy(c["bucket"])
        .agg(F.count("*").alias("n"))
    )


@register(
    "explode_outer_chunks",
    oracle="""
    WITH src AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN NULL
                  ELSE string_split(substr(text, 1, 40), ' ') END AS arr
      FROM documents WHERE doc_id < 100),
    ex AS (
      SELECT doc_id,
             unnest(CASE WHEN arr IS NULL THEN [CAST(NULL AS VARCHAR)]
                         ELSE arr END) AS word
      FROM src)
    SELECT doc_id, word FROM ex
    """,
)
def explode_outer_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with a NULL array survive as (id, NULL)
    instead of being dropped — the left-outer flavor of the reference's
    1-row->N-rows chunking shape (SURVEY A2).  The oracle emulates it
    with the [NULL]-substitution idiom."""
    src = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 10 == 0, F.lit(None)).otherwise(
                F.split(F.substring("text", 1, 40), " ")
            ).alias("arr"),
        )
    )
    return src.select("doc_id", F.explode_outer("arr").alias("word"))


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, revenue, c_acctbal, n_name FROM (
      SELECT c_custkey, c_name,
             CAST(SUM({_dcents('l_extendedprice')} * (100 - {_dcents('l_discount')})) AS BIGINT)
               AS rev_c,
             CAST(SUM({_dcents('l_extendedprice')} * (100 - {_dcents('l_discount')})) AS BIGINT)
               / 10000.0 AS revenue,
             c_acctbal, n_name
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1996-04-01'
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name, c_acctbal, n_name)
    ORDER BY rev_c DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analog: top-20 customers by revenue lost to returns in
    one quarter.  The classic 4-table star: date + returnflag predicates
    push to the two fact scans, nation broadcasts, the agg keys on the
    customer grain, and the top-20 is TakeOrderedAndProject on exact
    integer cents (deterministic ties via c_custkey)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev_c = F.sum(
        _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    ).alias("rev_c")
    agg = (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, F.col("l_orderkey") == o["o_orderkey"])
        # bounded: nation is 25 rows by TPC-H schema
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(rev_c)
    )
    return (
        agg.orderBy(F.col("rev_c").desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            (F.col("rev_c") / 10000.0).alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


@register(
    "q18_large_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM({_dcents('l_quantity')}) > 20000)
    SELECT c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice,
           CAST(SUM({_dcents('l_quantity')}) AS BIGINT) / 100.0 AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analog: orders whose total quantity exceeds 200 (top
    ~1% of the fixture), with their customers.  The HAVING subquery is
    a semi join on the already-aggregated order grain — the big
    lineitem table is scanned once for the filter agg and once for the
    final agg, both keyed on l_orderkey so AQE shares the exchange
    layout; quantities aggregate in exact integer centi-units."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_cents("l_quantity")).alias("qc"))
        .filter(F.col("qc") > 20000)
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li.join(big, "l_orderkey", "left_semi"),
              F.col("l_orderkey") == o["o_orderkey"])
        .groupBy(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
        )
        .agg((F.sum(_cents("l_quantity")) / 100.0).alias("sum_qty"))
    )


@register(
    "join_skew_profile",
    oracle="""
    WITH per_key AS (
      SELECT l_orderkey, COUNT(*)::BIGINT AS rows_per_key
      FROM lineitem GROUP BY l_orderkey),
    hist AS (
      SELECT rows_per_key, COUNT(*)::BIGINT AS n_keys
      FROM per_key GROUP BY rows_per_key),
    tot AS (SELECT SUM(rows_per_key * n_keys) AS total_rows,
                   MAX(rows_per_key) AS max_rows
            FROM hist)
    SELECT h.rows_per_key, h.n_keys,
           CAST(h.rows_per_key * h.n_keys * 1000000 // t.total_rows
                AS BIGINT) AS mass_micro,
           h.rows_per_key = t.max_rows AS is_heaviest
    FROM hist h, tot t
    """,
)
def join_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join key-distribution profile — the diagnosis a 100-TB run
    performs BEFORE a large join to decide whether it needs salting or
    AQE skew handling: the count-of-counts histogram of rows per join
    key (here lineitem's l_orderkey, the fact side of the orders join),
    each bucket's share of total rows in integer micro-units, and a
    heaviest-bucket marker.  A healthy key (this fixture: 1-7 lineitems
    per order) shows all mass in single-digit buckets; a power-law key
    shows a bucket with tiny n_keys carrying outsized mass_micro —
    exactly the key you salt (join_salted_skew is this repo's
    treatment; THIS row is the instrument that tells you to use it).
    Companion to lsh_bucket_stats (band occupancy) and
    dup_cluster_stats (component sizes): every shuffle-shaped blowup
    gets a cheap monitor that runs before the cost is paid.

    Scale shape: two map-side-combined aggregations — per-key counts
    (the shuffle moves (key, partial count), never rows), then the
    tiny count-of-counts; the totals side is a 1-row broadcast.  No
    join against the fact table, no window over data."""
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count("*").alias("rows_per_key"))
    hist = per_key.groupBy("rows_per_key").agg(F.count("*").alias("n_keys"))
    tot = hist.agg(
        F.sum(F.col("rows_per_key") * F.col("n_keys")).alias("total_rows"),
        F.max("rows_per_key").alias("max_rows"),
    )
    # bounded: 1-row totals aggregate
    j = hist.crossJoin(F.broadcast(tot))
    return j.select(
        "rows_per_key",
        "n_keys",
        F.expr("rows_per_key * n_keys * 1000000 DIV total_rows").alias(
            "mass_micro"
        ),
        (F.col("rows_per_key") == F.col("max_rows")).alias("is_heaviest"),
    )
