"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``semantic_query_engine_spark``; this module
only adapts its query registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from semantic_query_engine_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full Spark-native
    RAG pipeline (embed-in-plan -> cache-miss -> top-3 retrieval ->
    context assembly -> prompt -> deterministic generation)."""
    from semantic_query_engine_spark.plans.rag import rag_ask

    return rag_ask(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query; rows-only
    ops (streaming state, LSH/ML stages) are intentionally absent."""
    # jsonl_ingest's static oracle names a shared scratch file; ensure
    # it exists even if the caller executes oracles before queries.
    from semantic_query_engine_spark.queries.ingest_q import ensure_jsonl

    ensure_jsonl()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
