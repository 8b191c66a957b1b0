"""Pandas-UDF surface WITH oracles: applyInPandas (grouped map) and
mapInPandas (UDTF-shape) running deterministic logic that has an exact
SQL twin — proving the Arrow plumbing itself is correct, not just that
it runs.  Plus the multimodal decode pipeline (deterministic fake
decoder -> oracle over byte arithmetic)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table
from .registry import register


@register(
    "applyinpandas_rank",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rank_in_cust
    FROM orders WHERE o_custkey < 200
    """,
)
def applyinpandas_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map Pandas UDF (applyInPandas): per-customer ranking
    computed in pandas, checked against the SQL window oracle.  The
    grouped-map is the custom-stateful-operator escape hatch (SURVEY §2
    UDF row); this query pins its partition->group->Arrow->pandas
    round-trip exactly."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)

    def rank(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="mergesort"
        )
        pdf["rank_in_cust"] = range(1, len(pdf) + 1)
        return pdf[["o_custkey", "o_orderkey", "rank_in_cust"]]

    return o.select("o_custkey", "o_orderkey", "o_totalprice").groupBy(
        "o_custkey"
    ).applyInPandas(rank, "o_custkey long, o_orderkey long, rank_in_cust int")


@register(
    "mapinpandas_tokens",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(regexp_replace(text, chr(10), ' ', 'g')), '\\s+')) AS INT) AS n_tokens
    FROM documents
    """,
)
def mapinpandas_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas token counting replicating the JVM-side tokenizer
    byte-for-byte (newline->space, trim, whitespace split) — the Arrow
    batch path produces identical results to the codegen path and the
    SQL oracle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def count_tokens(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cleaned = (
                pdf["text"].fillna("").str.replace("\n", " ", regex=False).str.strip()
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": cleaned.str.split(r"\s+", regex=True).map(len).astype("int32"),
                }
            )

    return docs.mapInPandas(count_tokens, "doc_id long, n_tokens int")


@register(
    "multimodal_decode",
    oracle="""
    WITH meta AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS INT) AS n_bytes
      FROM documents)
    SELECT doc_id, n_bytes,
           CAST(n_bytes % 64 + 1 AS INT) AS width,
           CAST((n_bytes // 64) % 64 + 1 AS INT) AS height,
           CASE WHEN n_bytes % 2 = 0 THEN 'fakeimg' ELSE 'fakevid' END AS format,
           CAST(CASE WHEN n_bytes % 2 = 0 THEN 1 ELSE n_bytes % 30 + 1 END AS INT) AS n_frames
    FROM meta
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode pipeline: opaque binary payload -> mapInPandas
    decoder -> typed metadata.  The decoder is the documented
    deterministic fake (no codecs in the container), so the Arrow
    plumbing is oracle-checked end-to-end via byte arithmetic."""
    from ..operators.multimodal import attach_binary_payload, decode_metadata

    docs = load_table(spark, sf_dir, "documents")
    return decode_metadata(attach_binary_payload(docs))


@register(
    "pandas_udaf_mean",
    oracle="""
    SELECT c_nationkey,
           ROUND(CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                 / (100.0 * COUNT(*)), 6) AS mean_bal,
           COUNT(*) AS n
    FROM customer GROUP BY c_nationkey
    """,
)
def pandas_udaf_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate Pandas UDF (the UDAF shape, SURVEY §2 Part B
    UDF/UDAF/UDTF row): a vectorized aggregate computed in pandas per
    group.  Summation runs over exact integer cents inside the UDF so
    the result is bit-identical to the fixed-point SQL oracle — the
    same determinism discipline as the JVM aggregates."""
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def cents_mean(v: pd.Series) -> float:
        cents = (v * 100).round().astype("int64")
        return round(int(cents.sum()) / (100.0 * len(cents)), 6)

    # a grouped-agg pandas UDF cannot share an agg with JVM aggregates,
    # so the row count is a pandas aggregate too
    @pandas_udf("long")
    def pd_count(v: pd.Series) -> int:
        return len(v)

    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        cents_mean("c_acctbal").alias("mean_bal"),
        pd_count("c_acctbal").alias("n"),
    )


@register(
    "multimodal_features",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             list_transform(range(length(text)),
                            i -> CAST(floor(ascii(substr(text, i + 1, 1)) / 16)
                                      AS INT)) AS bins,
             length(text) AS n
      FROM documents WHERE doc_id < 200),
    f AS (
      SELECT doc_id,
             CASE WHEN n = 0
                  THEN list_transform(range(16), k -> CAST(0 AS BIGINT))
                  ELSE list_transform(range(16),
                         k -> CAST(len(list_filter(bins, x -> x = k))
                                   AS BIGINT) * 1000000 // n)
             END AS features
      FROM b)
    SELECT doc_id, CAST(k AS INT) AS bin_idx,
           features[CAST(k AS INT) + 1] AS value
    FROM f, range(16) AS t(k)
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction: opaque binary payload -> Arrow-
    batched pandas UDF -> fixed-dim embedding (normalized 16-bin byte
    histogram, micro-unit integers for cross-engine determinism).  The
    fixture text is pure ASCII, so the byte histogram
    equals a char-code histogram and DuckDB can verify the UDF's output
    exactly — the Arrow batch plumbing (binary in, vector out) is the
    part a real CLIP/wav2vec extractor would reuse unchanged.

    Declared output is exploded (doc_id, bin_idx, value) rows — scalar
    columns only, so any engine/driver can sort and hash them; API users
    wanting the vector use operators.multimodal.extract_features
    directly."""
    from ..operators.multimodal import attach_binary_payload, extract_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    feats = extract_features(attach_binary_payload(docs))
    return feats.select(
        "doc_id", F.posexplode("features").alias("bin_idx", "value")
    )


@register(
    "multimodal_resize",
    oracle="""
    WITH p AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents WHERE doc_id < 200)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_bytes_in,
           8 AS out_w, 8 AS out_h,
           CASE WHEN n = 0 THEN repeat('00', 64)
                ELSE list_aggregate(
                  list_transform(range(64),
                    i -> substr(hx, 2 * least(i * n // 64, n - 1) + 1, 2)),
                  'string_agg', '')
           END AS resized_hex
    FROM p
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize: payload -> nearest-neighbor byte resampling to
    a fixed 8x8 'tensor' via mapInPandas (operators/multimodal.py:
    resize_stub).  The resized bytes are projected as hex so the DuckDB
    oracle can rebuild them byte-for-byte from the hex of the identical
    UTF-8 payload (index i picks byte i*n//64, clipped — the same
    arithmetic as the numpy path), upgrading this from rows-only to a
    full value-hash check; pytest additionally pins determinism and
    output size (tests/test_sources_and_sinks.py)."""
    from ..operators.multimodal import attach_binary_payload, resize_stub

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    out = resize_stub(attach_binary_payload(docs))
    return out.select(
        "doc_id", "n_bytes_in", "out_w", "out_h",
        F.hex("resized").alias("resized_hex"),
    )
