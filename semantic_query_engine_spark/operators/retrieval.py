"""Similarity retrieval — the reference's ANN search surface
(/root/reference/app/main.py:347-373, SURVEY A15) re-expressed Spark-first.

Strategy ladder (SURVEY §4.3):
1. exact brute force (this module): broadcast the query vector as a plan
   constant, score every row with a codegen'd cosine expression, take
   top-k.  Catalyst compiles orderBy().limit(k) to TakeOrderedAndProject:
   per-partition top-k then a k-row merge on the driver — embarrassingly
   parallel, no full sort, no shuffle of the scored set.  At 100 TB this
   is a single scan whose cost is bounded by I/O.
2. LSH (operators/ann.py): MLlib BucketedRandomProjectionLSH for
   sublinear candidate generation.
3. IVF partition pruning (operators/ann.py): KMeans centroids ->
   cluster-partitioned layout -> probe nearest clusters only — the
   DataFrame analog of the reference's HNSW intent.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import l2_norm, vector_lit, with_cosine

DEFAULT_TOP_K = 3  # /root/reference/app/main.py:467,601


def score_against(
    index: DataFrame,
    query_vec: Iterable[float],
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a cosine `score` column against a constant query vector
    (the reference normalizes then HNSW-searches; here the scoring
    expression itself is the index probe)."""
    # with_cosine (r14): the norms land in a pre-projection so each is
    # computed once per row (the constant query vector's norm included —
    # HOF aggregates over literals are not constant-folded), 3 array
    # aggregates per row instead of cosine()'s 5
    return with_cosine(index, F.col(vec_col), vector_lit(query_vec), "score")


def topk_similar(
    index: DataFrame,
    query_vec: Iterable[float],
    k: int = DEFAULT_TOP_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine (SURVEY A15).  Deterministic tie-break on id
    so the result set is stable across partitionings."""
    scored = score_against(index, query_vec, vec_col)
    return (
        scored.select(id_col, "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def knn_join(
    probes: DataFrame,
    index: DataFrame,
    k: int = DEFAULT_TOP_K,
    probe_id: str = "probe_id",
    probe_vec: str = "probe_vec",
    index_id: str = "vec_id",
    index_vec: str = "embedding",
    broadcast_probes: bool = True,
    exclude_self: bool = False,
) -> DataFrame:
    """kNN join: every probe row -> its k nearest index rows (the
    engine's signature join, SURVEY §2 Part B joins).

    Scale shape: broadcast the (small) probe set against the (huge)
    index so scoring is a map-only stage over index splits; the only
    shuffle is the per-probe top-k window, keyed by probe_id — cardinality
    |probes| * |index| rows never materialize beyond the window's
    per-partition top-k with AQE.  For probe sets too big to broadcast,
    flip broadcast_probes off and let AQE pick the join.
    """
    p = probes.select(
        F.col(probe_id).alias("__pid"),
        F.col(probe_vec).alias("__pvec"),
        # probe norms computed ONCE on the (small) probe side instead of
        # twice per (index row x probe) pair (r14, with_cosine)
        l2_norm(probe_vec).alias("__pnorm"),
    )
    if broadcast_probes:
        # bounded: caller-gated (broadcast_probes flag) for small probe sets
        p = F.broadcast(p)
    scored = with_cosine(
        index.crossJoin(p),
        F.col(index_vec),
        F.col("__pvec"),
        "score",
        norm_b="__pnorm",
    ).select(F.col("__pid").alias(probe_id), F.col(index_id), "score")
    if exclude_self:
        # drop the probe's own index row BEFORE ranking (a probe that is
        # itself a member of the index, as in dedup-style self-kNN)
        scored = scored.filter(F.col(index_id) != F.col(probe_id))
    w = Window.partitionBy(probe_id).orderBy(F.desc("score"), F.asc(index_id))
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
    )


def threshold_probe(
    index: DataFrame,
    query_vec: Iterable[float],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    payload_col: Optional[str] = None,
) -> DataFrame:
    """Top-1 similarity with a floor — the reference's semantic-cache hit
    test (sim >= 0.96 -> return cached answer,
    /root/reference/app/main.py:67-98, SURVEY A12).  Returns 0 or 1 rows."""
    scored = score_against(index, query_vec, vec_col).filter(
        F.col("score") >= F.lit(threshold)
    )
    cols = [id_col, "score"] + ([payload_col] if payload_col else [])
    return scored.select(*cols).orderBy(F.desc("score"), F.asc(id_col)).limit(1)
