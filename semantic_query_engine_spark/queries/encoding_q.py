"""Scalar-surface additions (round 5, session 2): map transforms,
binary encodings / cryptographic digests, and URL parsing — the
remaining built-in function families the relational surface had not
yet exercised.  All map/array outputs are exploded to scalar rows for
the list-strict oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table, register_views
from .registry import register


@register(
    "map_transform_funcs",
    oracle="""
    WITH base AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(o_orderkey % 3 AS BIGINT) AS prio,
             CAST(length(o_orderpriority) AS BIGINT) AS plen
      FROM orders WHERE o_orderkey < 1000)
    SELECT o_orderkey, mkey, mval FROM (
      SELECT o_orderkey, 'cents' AS mkey, cents * 2 AS mval FROM base
      UNION ALL
      SELECT o_orderkey, 'prio', prio * 2 FROM base WHERE prio * 2 > 0
      UNION ALL
      SELECT o_orderkey, 'plen', plen * 2 + 1 FROM base)
    """,
)
def map_transform_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: map_from_arrays -> transform_values
    (double every value) -> map_filter (drop zero-valued keys on a
    subset) -> map_zip_with (merge with a bonus map adding +1 to one
    key) — the map-typed feature-bag manipulation a metadata column
    needs.  Entries are exploded to (key, value) rows for the gate; the
    oracle spells each key's pipeline as a UNION of scalar rows.

    Map-only at any scale — map columns never shuffle here."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    base = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderkey") % 3).cast("long").alias("prio"),
        F.length("o_orderpriority").cast("long").alias("plen"),
    )
    m = F.map_from_arrays(
        F.array(F.lit("cents"), F.lit("prio"), F.lit("plen")),
        F.array(F.col("cents"), F.col("prio"), F.col("plen")),
    )
    doubled = F.transform_values(m, lambda _, v: v * 2)
    # drop keys whose doubled value is 0 ONLY for 'prio' (map_filter
    # with a key- and value-dependent predicate)
    filtered = F.map_filter(
        doubled, lambda k, v: (k != F.lit("prio")) | (v > 0)
    )
    bonus = F.map_from_arrays(
        F.array(F.lit("plen")), F.array(F.lit(1).cast("long"))
    )
    merged = F.map_zip_with(
        filtered,
        bonus,
        lambda _, v1, v2: F.coalesce(v1, F.lit(0).cast("long"))
        + F.coalesce(v2, F.lit(0).cast("long")),
    )
    return base.select(
        "o_orderkey", F.explode(merged).alias("mkey", "mval")
    )


@register(
    "encoding_funcs",
    oracle="""
    SELECT doc_id,
           hex(encode(substr(text, 1, 16))) AS hex_prefix,
           to_base64(encode(substr(text, 1, 16))) AS b64_prefix,
           sha256(substr(text, 1, 16)) AS sha256_prefix,
           md5(substr(text, 1, 16)) AS md5_prefix
    FROM documents WHERE doc_id < 500
    """,
)
def encoding_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary encodings and cryptographic digests (hex / base64 /
    SHA-256 / MD5) over a text prefix — the content-addressing
    primitives under artifact stores and cache keys (the engine's LFU
    cache keys on exactly such digests).  All map-only."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    prefix = F.substring("text", 1, 16)
    return docs.select(
        "doc_id",
        F.hex(F.encode(prefix, "UTF-8")).alias("hex_prefix"),
        F.base64(F.encode(prefix, "UTF-8")).alias("b64_prefix"),
        F.sha2(prefix, 256).alias("sha256_prefix"),
        F.md5(prefix).alias("md5_prefix"),
    )


@register(
    "url_parse_funcs",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             concat('https://', source, '.example.com/docs/',
                    CAST(doc_id % 40 AS VARCHAR),
                    '?utm_id=', CAST(doc_id AS VARCHAR), '&page=',
                    CAST(doc_id % 3 AS VARCHAR)) AS url
      FROM documents WHERE doc_id < 500)
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/?]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?]+([^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, '[?&]page=([^&]*)', 1) AS page_param
    FROM urls
    """,
)
def url_parse_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured URL parsing with parse_url (HOST / PATH / QUERY /
    single query parameter) over deterministically synthesized URLs —
    the extraction half of the crawl-curation pair whose dedup half is
    url_canonical_dedup.  The oracle re-derives each component with
    regexes, proving parse_url's semantics relationally.  Map-only."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        (F.col("doc_id") % 40).cast("string"),
        F.lit("?utm_id="),
        F.col("doc_id").cast("string"),
        F.lit("&page="),
        (F.col("doc_id") % 3).cast("string"),
    )
    with_url = docs.select("doc_id", url.alias("url"))
    return with_url.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("page")).alias("page_param"),
    )
