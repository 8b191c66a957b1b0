"""Statistical aggregates, regex extraction, null handling, and
value-range window frames — rounding out SURVEY §2 Part B."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.fixtures import load_table, register_views
from .registry import register


@register(
    "percentile_agg",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90_price,
           ROUND(quantile_cont(o_totalprice, 0.99), 6) AS p99_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def percentile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median/p90/p99) per group —
    Spark's `percentile` == DuckDB's `quantile_cont` (both linear
    interpolation).  The approximate sketch variant is
    approx_percentile (rows-only territory, like approx_count_distinct).
    """
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderpriority,
               ROUND(percentile(o_totalprice, 0.5), 6) AS median_price,
               ROUND(percentile(o_totalprice, 0.9), 6) AS p90_price,
               ROUND(percentile(o_totalprice, 0.99), 6) AS p99_price
        FROM orders GROUP BY o_orderpriority
        """
    )


@register(
    "stats_agg",
    oracle="""
    SELECT c_nationkey,
           ROUND(stddev_samp(c_acctbal), 4) AS bal_stddev,
           ROUND(var_samp(c_acctbal), 2) AS bal_var,
           ROUND(corr(c_acctbal, CAST(c_custkey AS DOUBLE)), 6) AS bal_key_corr,
           bool_and(c_acctbal > -1000) AS all_above_floor,
           bool_or(c_acctbal > 9000) AS any_rich
    FROM customer GROUP BY c_nationkey
    """,
)
def stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance/correlation + boolean aggregates.  Stat moments
    are O(1e3-1e7) magnitude, so rounding absorbs the engines'
    accumulation-order differences."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.round(F.stddev_samp("c_acctbal"), 4).alias("bal_stddev"),
        F.round(F.var_samp("c_acctbal"), 2).alias("bal_var"),
        F.round(F.corr("c_acctbal", F.col("c_custkey").cast("double")), 6).alias(
            "bal_key_corr"
        ),
        F.bool_and(F.col("c_acctbal") > -1000).alias("all_above_floor"),
        F.bool_or(F.col("c_acctbal") > 9000).alias("any_rich"),
    )


@register(
    "regexp_funcs",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INT) AS brand_num,
           regexp_matches(p_name, '[aeiou]{2}') AS has_double_vowel,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS vowels_masked
    FROM part WHERE p_partkey < 500
    """,
)
def regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar suite: extract (group), match test, global replace."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).cast("int").alias("brand_num"),
        F.col("p_name").rlike("[aeiou]{2}").alias("has_double_vowel"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("vowels_masked"),
    )


@register(
    "null_handling",
    oracle="""
    SELECT c_custkey,
           nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
           coalesce(nullif(c_mktsegment, 'BUILDING'), '(redacted)') AS seg_filled,
           nullif(c_mktsegment, 'BUILDING') IS NULL AS is_building,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_nonneg,
           ifnull(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal_floor
    FROM customer
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics surface: nullif / coalesce / IS NULL / CASE-null /
    ifnull — identical three-valued logic on both engines."""
    register_views(spark, sf_dir, ["customer"])
    return spark.sql(
        """
        SELECT c_custkey,
               nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
               coalesce(nullif(c_mktsegment, 'BUILDING'), '(redacted)') AS seg_filled,
               nullif(c_mktsegment, 'BUILDING') IS NULL AS is_building,
               CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_nonneg,
               ifnull(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0D) AS bal_floor
        FROM customer
        """
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                          RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_within_1k,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                      RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0 AS sum_within_1k
    FROM orders WHERE o_orderkey < 3000
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) window frame: peers within $1000 below each
    order's price.  Range frames are tie-stable (value-defined), so the
    result is deterministic without id tie-breaks."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.count("*").over(w).alias("n_within_1k"),
        (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(w) / 100.0).alias(
            "sum_within_1k"
        ),
    )


@register(
    "histogram_prices",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000.0) AS INT) AS bucket,
           COUNT(*) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders GROUP BY 1
    """,
)
def histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via arithmetic bucketing (floor(x/width)) —
    the shuffle-light building block for distribution profiling: one
    map-side-combined aggregation, bucket count independent of rows."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.floor(F.col("o_totalprice") / 50000.0).cast("int").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@register(
    "correlated_scalar_subquery",
    oracle="""
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT)
             * (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
             - (SELECT CAST(SUM(CAST(round(o3.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                FROM orders o3 WHERE o3.o_custkey = o.o_custkey) AS delta_cents_x_n,
           (SELECT COUNT(*) FROM orders o4 WHERE o4.o_custkey = o.o_custkey) AS n_cust_orders
    FROM orders o WHERE o_orderkey < 2000
    """,
)
def correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (each order vs its own customer's
    average) — Catalyst de-correlates the subqueries into aggregates +
    joins.  The delta is kept in EXACT integers (cents x group size:
    price_c*n - sum_c) with no division or rounding anywhere — a
    cents-average over ~8 rows lands exactly on 4-decimal rounding
    boundaries, where Spark's BigDecimal HALF_UP and DuckDB's
    scaled-double round() legitimately disagree by one ulp."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT)
                 * (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
                 - (SELECT SUM(CAST(round(o3.o_totalprice * 100) AS BIGINT))
                    FROM orders o3 WHERE o3.o_custkey = o.o_custkey) AS delta_cents_x_n,
               (SELECT COUNT(*) FROM orders o4 WHERE o4.o_custkey = o.o_custkey) AS n_cust_orders
        FROM orders o WHERE o_orderkey < 2000
        """
    )


@register(
    "approx_percentile_agg",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.25), 2) AS exact_p25,
           ROUND(quantile_cont(o_totalprice, 0.5), 2) AS exact_p50,
           ROUND(quantile_cont(o_totalprice, 0.75), 2) AS exact_p75,
           TRUE AS within_tol
    FROM orders GROUP BY o_orderpriority
    """,
)
def approx_percentile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-quantile approx_percentile (rank sketch) per group — the
    constant-memory quantile PROFILE (p25/p50/p75 in ONE sketch pass)
    for 100 TB data profiling.  Error-gated (VERDICT r10 #7, closing
    the last rows-only entries): raw sketch values cannot be
    value-hashed against another engine's sketch, so the output
    carries the exact interpolated quantiles plus one `within_tol`
    boolean — every quantile must land within 1% of the continuous OR
    the discrete exact value (the OR-disjunct lesson from round 8: at
    small group sizes the interpolation-vs-data-value gap alone
    exceeds 1% even when the sketch is rank-perfect).  Single-median
    twin: approx_percentile_checked below."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        WITH ranked AS (
          SELECT o_orderpriority, o_totalprice,
                 cume_dist() OVER (
                   PARTITION BY o_orderpriority ORDER BY o_totalprice
                 ) AS cd
          FROM orders
        ), exact AS (
          SELECT o_orderpriority,
                 percentile(o_totalprice, array(0.25D, 0.5D, 0.75D)) AS cont,
                 array(min(CASE WHEN cd >= 0.25 THEN o_totalprice END),
                       min(CASE WHEN cd >= 0.5 THEN o_totalprice END),
                       min(CASE WHEN cd >= 0.75 THEN o_totalprice END)) AS disc,
                 approx_percentile(
                   o_totalprice, array(0.25D, 0.5D, 0.75D), 10000) AS approx
          FROM ranked GROUP BY o_orderpriority
        )
        SELECT o_orderpriority,
               ROUND(cont[0], 2) AS exact_p25,
               ROUND(cont[1], 2) AS exact_p50,
               ROUND(cont[2], 2) AS exact_p75,
               (abs(approx[0] - cont[0]) / cont[0] <= 0.01
                  OR abs(approx[0] - disc[0]) / disc[0] <= 0.01)
               AND (abs(approx[1] - cont[1]) / cont[1] <= 0.01
                  OR abs(approx[1] - disc[1]) / disc[1] <= 0.01)
               AND (abs(approx[2] - cont[2]) / cont[2] <= 0.01
                  OR abs(approx[2] - disc[2]) / disc[2] <= 0.01)
               AS within_tol
        FROM exact
        """
    )


@register(
    "approx_percentile_checked",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 2) AS exact_median,
           TRUE AS within_tol
    FROM orders GROUP BY o_orderpriority
    """,
)
def approx_percentile_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy-gated sketch check: the rank-based approx median must
    land within 1% of an exact median, and that claim itself goes
    through the value-hash gate — if a Spark upgrade (or a sketch
    regression) drifts the approximation out of tolerance,
    `within_tol` flips to false and the oracle comparison fails loudly.

    The sketch is gated against the continuous-interpolated median OR
    the discrete (actual-data-value) median: a rank-exact sketch
    returns a data value, so at small group sizes the
    interpolation-vs-value gap alone can exceed 1% (measured 1.097%
    on sf0.001's 316-row 2-HIGH group — caught by
    tools/revalidate_gates.py in round 8) even when the sketch is
    PERFECT.  A real >1%-rank-error regression still fails both
    disjuncts.  This is how the engine keeps constant-memory sketches
    honest without pretending DuckDB can reproduce their internals."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        WITH ranked AS (
          SELECT o_orderpriority, o_totalprice,
                 cume_dist() OVER (
                   PARTITION BY o_orderpriority ORDER BY o_totalprice
                 ) AS cd
          FROM orders
        ), exact AS (
          SELECT o_orderpriority,
                 percentile(o_totalprice, 0.5) AS cont_median,
                 min(CASE WHEN cd >= 0.5 THEN o_totalprice END) AS disc_median,
                 approx_percentile(o_totalprice, 0.5, 10000) AS approx_median
          FROM ranked GROUP BY o_orderpriority
        )
        SELECT o_orderpriority,
               ROUND(cont_median, 2) AS exact_median,
               abs(approx_median - cont_median) / cont_median <= 0.01
                 OR abs(approx_median - disc_median) / disc_median <= 0.01
                 AS within_tol
        FROM exact
        """
    )


@register(
    "distinct_count_checked",
    oracle="""
    SELECT COUNT(DISTINCT l_partkey) AS exact_parts, TRUE AS within_tol
    FROM lineitem
    """,
)
def distinct_count_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy-gated HLL++ check (same pattern as
    approx_percentile_checked): approx_count_distinct at rsd=0.02 must
    land within 5% of the exact distinct count, with the tolerance
    claim hash-checked against the exact-only oracle.  HLL merge is
    commutative, so the sketch value is deterministic for fixed data
    regardless of partitioning — the flag cannot flap."""
    li = load_table(spark, sf_dir, "lineitem")
    exact = F.countDistinct("l_partkey")
    approx = F.approx_count_distinct("l_partkey", 0.02)
    return li.agg(
        exact.alias("exact_parts"),
        (
            F.abs(approx.cast("double") - exact.cast("double"))
            / exact.cast("double")
            <= 0.05
        ).alias("within_tol"),
    )
