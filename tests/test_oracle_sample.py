"""In-pytest oracle gate over a representative sample (the full gate is
tools/check_oracle.py): catches Spark/DuckDB drift on every test run
without the full 1.5-minute sweep.  Also proves the suite is robust to
the host session's ANSI setting (the driver owns its session config)."""

from __future__ import annotations

import duckdb
import pytest

from semantic_query_engine_spark.queries import REGISTRY
from semantic_query_engine_spark.sources.fixtures import TABLES

SAMPLE = [
    "semantic_topk",       # vector math + top-k
    "q1_pricing_summary",  # fixed-point aggregation
    "doc_chunk",           # table-generating expression
    "events_sessionize",   # windows over nanos timestamps
    "rag_ask_flagship",    # the composed pipeline
    "mapinpandas_tokens",  # Arrow UDF path
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _match(spark, duck, name, sf_dir):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from check_oracle import compare

    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(spec.oracle).fetchdf()
    assert compare(spark_pdf, duck_pdf) == [], name


@pytest.mark.parametrize("name", SAMPLE)
def test_oracle_sample(spark, duck, sf_dir, name):
    _match(spark, duck, name, sf_dir)


def test_ansi_mode_insensitive(spark, duck, sf_dir):
    """The driver controls spark.sql.ansi.enabled; results must hold
    under both settings."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    for mode in ("true", "false"):
        spark.conf.set("spark.sql.ansi.enabled", mode)
        try:
            _match(spark, duck, "q1_pricing_summary", sf_dir)
            _match(spark, duck, "semantic_topk", sf_dir)
        finally:
            spark.conf.set("spark.sql.ansi.enabled", prev)
