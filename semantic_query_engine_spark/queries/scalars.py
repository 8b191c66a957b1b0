"""Scalar function surface (SURVEY §2 Part B: string / date / math /
array / JSON functions), one declared query per family, each a pure
projection (no shuffle; pushdown-friendly) with an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table
from .registry import register


@register(
    "string_funcs",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(p_brand) AS brand_upper,
           substring(p_name, 1, 8) AS name_prefix,
           CAST(length(p_name) AS INT) AS name_len,
           starts_with(p_type, 'PROMO') AS is_promo,
           contains(p_name, 'e') AS has_e,
           p_name LIKE '%a%' AS like_a,
           replace(p_name, ' ', '_') AS name_snake,
           concat_ws('|', p_brand, p_type) AS brand_type,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           split_part(p_type, ' ', 1) AS type_head,
           CAST(levenshtein(p_brand, 'Brand#11') AS INT) AS brand_dist
    FROM part
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar suite — the reference's replace/trim/split/concat/
    prefix-test surface (SURVEY A1/A2/A16/A17 + filename filters
    /root/reference/app/main.py:431) plus standard extensions."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.col("p_type").startswith("PROMO").alias("is_promo"),
        F.col("p_name").contains("e").alias("has_e"),
        F.col("p_name").like("%a%").alias("like_a"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.split_part("p_type", F.lit(" "), F.lit(1)).alias("type_head"),
        F.levenshtein("p_brand", F.lit("Brand#11")).alias("brand_dist"),
    )


@register(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dy,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS INT) AS days_to_y2k
    FROM orders WHERE o_orderkey < 2000
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar suite over o_orderdate.  Timestamps are always
    projected as formatted strings so the cross-engine hash is
    timezone-representation-proof (FIXTURES.md §3)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias(
            "plus_30d"
        ),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_y2k"
        ),
    )


@register(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_quantity), 6) AS qty_sqrt,
           l_quantity * l_quantity AS qty_sq,
           abs(l_discount - 0.05) AS disc_dev,
           round(l_extendedprice / 7, 2) AS price_div,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_floor,
           greatest(l_quantity, 25.0) AS qty_hi,
           least(l_quantity, 25.0) AS qty_lo,
           round(ln(l_extendedprice), 6) AS price_ln,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem WHERE l_orderkey < 3000
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar suite (SURVEY A7/A8's sqrt/pow/abs plus the standard
    surface)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 3000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.col("l_extendedprice") / 7, 2).alias("price_div"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_floor"),
        F.greatest("l_quantity", F.lit(25.0)).alias("qty_hi"),
        F.least("l_quantity", F.lit(25.0)).alias("qty_lo"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@register(
    "array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           ROUND(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))), 6) AS head_sum,
           ROUND(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS vmax,
           ROUND(list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS vmin,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive
    FROM embeddings WHERE vec_id < 200
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar suite over the embedding column (SURVEY §2 Part B
    array fns: size/slice/element_at/transform/filter/aggregate)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(
            F.aggregate(
                F.slice("embedding", 1, 8),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double"),
            ),
            6,
        ).alias("head_sum"),
        F.round(F.array_max(as_double), 6).alias("vmax"),
        F.round(F.array_min(as_double), 6).alias("vmin"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "json_funcs",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (SURVEY §2 Part B JSON fns) over events.props —
    the engine-side analog of the reference's json.loads of cache
    entries (/root/reference/app/main.py:79,95)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "multimodal_bytes",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           md5(text) AS content_md5,
           octet_length(encode(text)) // 4 AS n_fake_patches
    FROM documents
    """,
)
def multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing, metadata path: treat content as an opaque
    binary column with typed metadata (byte length, content hash,
    derived patch count).  The decode/feature path is the Pandas-UDF
    pipeline in operators/multimodal.py; this declared query checks the
    binary-column semantics end-to-end."""
    d = load_table(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.length(blob).alias("n_bytes"),
        F.md5(blob).alias("content_md5"),
        (F.length(blob) / F.lit(4)).cast("long").alias("n_fake_patches"),
    )


@register(
    "array_map_funcs",
    oracle="""
    WITH base AS (
      SELECT vec_id, label,
             range(1, label + 2) AS seq,
             range(2, 7) AS arr2
      FROM embeddings WHERE vec_id < 200)
    SELECT vec_id,
           COALESCE(array_to_string(list_transform(list_sort(list_intersect(seq, arr2)), x -> CAST(x AS VARCHAR)), ','), '') AS inter_s,
           COALESCE(array_to_string(list_transform(list_sort(list_distinct(list_concat(seq, arr2))), x -> CAST(x AS VARCHAR)), ','), '') AS union_s,
           COALESCE(array_to_string(list_transform(list_sort(list_filter(list_distinct(arr2), x -> NOT list_contains(seq, x))), x -> CAST(x AS VARCHAR)), ','), '') AS except_s,
           COALESCE(array_to_string(list_transform(flatten([seq, seq]), x -> CAST(x AS VARCHAR)), ','), '') AS flat_s,
           COALESCE(array_to_string(list_transform(list_reverse(seq), x -> CAST(x AS VARCHAR)), ','), '') AS rev_s,
           list_contains(seq, 5) AS has_five,
           MAP(['a', 'b'], [label, label * 2])['a'][1] AS map_a,
           COALESCE(array_to_string(map_keys(MAP(['a', 'b'], [label, label * 2])), ','), '') AS map_keys_s
    FROM base
    """,
)
def array_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array algebra (intersect/union/except/flatten/reverse/contains,
    all order-stabilized via array_sort) and map construction/access
    (SURVEY §2 Part B array/map fns).  Spark's element_at(map, k) is a
    scalar while DuckDB's map[k] is a 1-list — the oracle unwraps with
    [1]; everything else is pure set algebra identical in both engines."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)

    def s(arr):
        return F.array_join(F.transform(arr, lambda x: x.cast("string")), ",")

    seq = F.sequence(F.lit(1), F.col("label") + 1)
    arr2 = F.sequence(F.lit(2), F.lit(6))
    m = F.map_from_arrays(
        F.array(F.lit("a"), F.lit("b")),
        F.array(F.col("label"), F.col("label") * 2),
    )
    return emb.select(
        "vec_id",
        s(F.array_sort(F.array_intersect(seq, arr2))).alias("inter_s"),
        s(F.array_sort(F.array_union(seq, arr2))).alias("union_s"),
        s(F.array_sort(F.array_except(arr2, seq))).alias("except_s"),
        s(F.flatten(F.array(seq, seq))).alias("flat_s"),
        s(F.reverse(seq)).alias("rev_s"),
        F.array_contains(seq, 5).alias("has_five"),
        F.element_at(m, "a").alias("map_a"),
        F.array_join(F.map_keys(m), ",").alias("map_keys_s"),
    )


@register(
    "try_funcs",
    oracle="""
    SELECT doc_id,
           TRY_CAST(CASE WHEN doc_id % 3 = 0 THEN lang
                         ELSE CAST(doc_id AS VARCHAR) END AS INTEGER) AS maybe_int,
           CASE WHEN doc_id % 5 = 0 THEN NULL
                ELSE ROUND(CAST(n_chars AS DOUBLE) / (doc_id % 5), 6) END AS safe_div
    FROM documents
    """,
)
def try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expressions (try_cast / try_divide): malformed casts
    and division by zero yield NULL instead of failing the job — the
    behavior dirty 100 TB corpora require (one bad row must not kill a
    stage).  The oracle spells out the equivalent CASE semantics."""
    docs = load_table(spark, sf_dir, "documents")
    mixed = F.when(F.col("doc_id") % 3 == 0, F.col("lang")).otherwise(
        F.col("doc_id").cast("string")
    )
    return docs.select(
        "doc_id",
        mixed.try_cast("int").alias("maybe_int"),
        F.round(
            F.try_divide(F.col("n_chars").cast("double"), F.col("doc_id") % 5), 6
        ).alias("safe_div"),
    )


@register(
    "bit_funcs",
    oracle="""
    SELECT doc_id,
           doc_id & 255 AS low_byte,
           doc_id | 4096 AS with_flag,
           xor(doc_id, 170) AS xored,
           doc_id << 2 AS shl,
           doc_id >> 1 AS shr,
           CAST(bit_count(CAST(doc_id AS BIGINT)) AS INT) AS popcount
    FROM documents WHERE doc_id < 300
    """,
)
def bit_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator family (and/or/xor/shifts/popcount) — the
    primitives under bitmap indexes, bloom filters, and the engine's own
    SimHash operator (operators/simhash.py)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    d = F.col("doc_id")
    return docs.select(
        "doc_id",
        d.bitwiseAND(F.lit(255)).alias("low_byte"),
        d.bitwiseOR(F.lit(4096)).alias("with_flag"),
        d.bitwiseXOR(F.lit(170)).alias("xored"),
        F.shiftleft(d, 2).alias("shl"),
        F.shiftright(d, 1).alias("shr"),
        F.bit_count(d).alias("popcount"),
    )


@register(
    "agg_filtered",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) FILTER (WHERE c_acctbal > 5000) AS n_rich,
           CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT))
                FILTER (WHERE c_mktsegment = 'BUILDING') AS BIGINT) / 100.0
             AS building_bal,
           COUNT(*) AS n
    FROM customer GROUP BY c_nationkey
    """,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER clause / count_if): several
    differently-filtered aggregates in ONE pass over the data — the
    alternative is N self-joined subqueries.  Fixed-point money sum keeps
    the hash deterministic."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.count_if(F.col("c_acctbal") > 5000).alias("n_rich"),
        (
            F.sum(
                F.when(
                    F.col("c_mktsegment") == "BUILDING",
                    F.round(F.col("c_acctbal") * 100).cast("long"),
                )
            )
            / 100.0
        ).alias("building_bal"),
        F.count("*").alias("n"),
    )


@register(
    "regression_agg",
    oracle="""
    SELECT c_nationkey,
           ROUND(regr_slope(c_acctbal, CAST(c_custkey AS DOUBLE)), 6) AS slope,
           ROUND(regr_intercept(c_acctbal, CAST(c_custkey AS DOUBLE)), 4) AS icept,
           ROUND(regr_r2(c_acctbal, CAST(c_custkey AS DOUBLE)), 6) AS r2,
           CAST(regr_count(c_acctbal, CAST(c_custkey AS DOUBLE)) AS BIGINT) AS n
    FROM customer GROUP BY c_nationkey
    """,
)
def regression_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (regr_slope/intercept/r2/count) —
    one-pass distributed OLS per group, the analytics counterpart of the
    engine's ML surface.  Partial-aggregable, so it map-side-combines
    like any sum."""
    c = load_table(spark, sf_dir, "customer")
    x = F.col("c_custkey").cast("double")
    y = F.col("c_acctbal")
    return c.groupBy("c_nationkey").agg(
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("icept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.regr_count(y, x).alias("n"),
    )


@register(
    "variant_json",
    oracle="""
    SELECT event_id,
           event_type AS vtype,
           CAST(round(value * 100) AS BIGINT) AS cents,
           CAST(props ->> 'k' AS INT) AS k,
           user_id AS tag0
    FROM events WHERE event_id < 2000
    """,
)
def variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT round-trip (Spark 4): compose a nested
    JSON document per event, `parse_json` it into a VARIANT, and read
    every field back with typed `variant_get` path extraction — the
    open-ended-schema column type a 100 TB event-log pipeline stores
    instead of a thousand sparse columns.  VARIANT keeps a binary-encoded
    form, so repeated path reads don't re-parse text.  The oracle
    recomputes the same values from the base columns."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    js = F.concat(
        F.lit('{"meta": {"type": "'),
        F.col("event_type"),
        F.lit('", "cents": '),
        F.round(F.col("value") * 100).cast("long").cast("string"),
        F.lit('}, "tags": ['),
        F.col("user_id").cast("string"),
        F.lit(", "),
        F.get_json_object("props", "$.k"),
        F.lit("]}"),
    )
    v = ev.select("event_id", F.parse_json(js).alias("v"))
    return v.select(
        "event_id",
        F.variant_get("v", "$.meta.type", "string").alias("vtype"),
        F.variant_get("v", "$.meta.cents", "long").alias("cents"),
        F.variant_get("v", "$.tags[1]", "int").alias("k"),
        F.variant_get("v", "$.tags[0]", "long").alias("tag0"),
    )
