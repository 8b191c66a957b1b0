"""Semantic LFU cache as a managed table + deterministic batch jobs.

The reference keeps <=1000 {embedding, response, freq} entries in a Redis
list, does a client-side linear cosine scan with hit threshold 0.96,
bumps freq on hit, and evicts the first minimum-freq entry at capacity
(/root/reference/app/main.py:42-44,67-128, SURVEY A12-A14).

Spark-native: the cache is a small DataFrame (at rest: one parquet
table); probe / bump / evict / put are declarative plans.  The LFU
tie-break is made deterministic via (freq, insert_seq) ordering —
the reference's "first minimum in list order" is list-position-dependent
(/root/reference/app/main.py:107-114); insert_seq is its stable analog.

Schema: (entry_id long, embedding array<double>, response string,
         freq long, insert_seq long)
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .retrieval import threshold_probe

CACHE_CAPACITY = 1000  # /root/reference/app/main.py:42
CACHE_SIM_THRESHOLD = 0.96  # /root/reference/app/main.py:44


def probe(
    cache: DataFrame,
    query_vec: Iterable[float],
    threshold: float = CACHE_SIM_THRESHOLD,
) -> DataFrame:
    """0-or-1-row hit: argmax cosine over entries, floored at threshold
    (SURVEY A12)."""
    return threshold_probe(
        cache,
        query_vec,
        threshold,
        id_col="entry_id",
        vec_col="embedding",
        payload_col="response",
    )


def bump_freq(cache: DataFrame, entry_id: int) -> DataFrame:
    """freq+1 for the hit entry (/root/reference/app/main.py:92-96) as a
    columnar rewrite — the MERGE-style update of a tiny managed table."""
    return cache.withColumn(
        "freq",
        F.when(F.col("entry_id") == F.lit(entry_id), F.col("freq") + 1).otherwise(
            F.col("freq")
        ),
    )


def eviction_candidate(cache: DataFrame) -> DataFrame:
    """The one row LFU would evict: min freq, ties broken by lowest
    insert_seq (SURVEY A13)."""
    return cache.orderBy(F.asc("freq"), F.asc("insert_seq")).limit(1)


def evict_lfu(cache: DataFrame, n: int = 1) -> DataFrame:
    """Drop the n least-frequent entries (deterministic LFU).  Expressed
    as a rank-filter rather than an anti-join: one window over a <=1000
    row table."""
    # global window over <=CACHE_CAPACITY (1000) rows: the single
    # partition is intentional and bounded — LFU order is a total order
    # over the whole cache by definition
    w = Window.orderBy(F.asc("freq"), F.asc("insert_seq"))
    return (
        cache.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") > n)
        .drop("__r")
    )


def put(
    cache: DataFrame,
    entry: DataFrame,
    capacity: int = CACHE_CAPACITY,
) -> DataFrame:
    """Insert a new entry, evicting first if at capacity
    (/root/reference/app/main.py:121-128, SURVEY A14).  `entry` is a
    1-row DataFrame with the cache schema and freq=1."""
    n = cache.count()
    base = evict_lfu(cache, n - capacity + 1) if n >= capacity else cache
    return base.unionByName(entry)
