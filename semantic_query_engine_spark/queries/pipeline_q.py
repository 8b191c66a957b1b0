"""Composed-pipeline queries: the flagship RAG path as a DECLARED,
fully oracle-checked query (the generation stub is a deterministic
template, so even the answer string has a SQL twin), and the index-build
job (TF-IDF embedding -> rows-only)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.rag import SYSTEM_RULES, rag_ask
from ..sources.fixtures import load_table
from .registry import register

_Q = "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)"

_RAG_ORACLE = f"""
WITH hits AS (
  SELECT CAST(0 AS BIGINT) AS query_id, e.vec_id,
         list_cosine_similarity(e.embedding::DOUBLE[], {_Q}) AS score
  FROM embeddings e WHERE e.vec_id <> 0
  ORDER BY score DESC, e.vec_id LIMIT 3),
wd AS (
  SELECT h.query_id, h.vec_id AS doc_id, h.score, d.text,
         ROW_NUMBER() OVER (ORDER BY h.score DESC, h.vec_id) AS rnk
  FROM hits h JOIN documents d ON d.doc_id = h.vec_id),
asm AS (
  SELECT query_id,
         COUNT(*) AS n_docs,
         MIN(CASE WHEN rnk = 1 THEN doc_id END) AS top_doc_id,
         ROUND(MAX(score), 6) AS top_score,
         string_agg('--- Document ID: ' || CAST(doc_id AS VARCHAR) || ' ---' || chr(10)
                      || text || chr(10),
                    chr(10) ORDER BY score DESC, doc_id) AS context
  FROM wd GROUP BY query_id)
SELECT query_id, n_docs, top_doc_id, top_score, context,
       '{SYSTEM_RULES}' || chr(10) || chr(10) || 'Context:' || chr(10)
         || context || chr(10) || 'Question: query_' || CAST(query_id AS VARCHAR) AS prompt,
       'Based on ' || CAST(n_docs AS VARCHAR) || ' retrieved documents (best doc '
         || CAST(top_doc_id AS VARCHAR) || ', score ' || printf('%.6f', top_score)
         || '): see context.' AS answer
FROM asm
"""


@register("rag_ask_flagship", oracle=_RAG_ORACLE)
def rag_ask_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full composed read path (SURVEY A20,
    /root/reference/app/main.py:467-548): embed-in-plan query -> cache
    miss -> top-3 retrieval -> context assembly -> prompt -> generation.
    Every stage including the stubbed generation is oracle-checked."""
    return rag_ask(spark, sf_dir)


@register("index_build", oracle=None)
def index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch write path (SURVEY A27): read -> clean -> chunk(32) ->
    TF-IDF embed -> L2 normalize.  Returns the built chunk index with
    per-chunk embedding norms; TF-IDF has no SQL twin -> rows-only (the
    chunk grid itself is checked by doc_chunk; the vector math by
    vector_normalize)."""
    from ..plans.index_build import build_index

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    index = build_index(docs, chunk_size=32, dim=64)
    return index.select(
        "doc_id",
        "chunk_id",
        "chunk_key",
        F.size("embedding").alias("dim"),
        F.round(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: acc + x * x
            ),
            4,
        ).alias("unit_norm_sq"),
    )


@register("embed_documents", oracle=None)
def embed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The A4/A5 embedding surface via the Arrow-batched Pandas UDF
    adapter (deterministic crc32 bag-of-words stand-in): proves the
    mapInPandas plumbing (batch shape, empty-text zero-vector guard)
    without model weights.  Rows-only."""
    from ..ml.embedder import embed_with_pandas_udf

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = embed_with_pandas_udf(docs, dim=64)
    return out.select(
        "doc_id",
        F.size("embedding").alias("dim"),
        F.round(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x), 2).alias(
            "token_mass"
        ),
    )
