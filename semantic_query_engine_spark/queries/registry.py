"""Query registry: every declared engine capability is one named entry
binding (a) a Spark DataFrame builder `(spark, sf_dir) -> DataFrame` and
(b) an equivalent DuckDB oracle SQL string (or None for genuinely
non-SQL-expressible ops — streaming state, LSH, ML stages — which get
rows-only checks).

Determinism rules (FIXTURES.md §3): every computed column is aliased
identically on both sides; float aggregates are rounded to 6 decimals;
timestamps are projected as formatted strings; no wall-clock / RNG.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str]
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def fmt_doc(**kw):
    """Decorator (applied BELOW @register) that interpolates constants
    into a literal docstring via str.format — a `\"\"\"...\"\"\".format()`
    expression in function position is NOT a docstring (fn.__doc__ stays
    None and the registry's doc field goes empty)."""

    def deco(fn: QueryFn) -> QueryFn:
        fn.__doc__ = (fn.__doc__ or "").format(**kw)
        return fn

    return deco


def register(name: str, oracle: Optional[str] = None):
    """Decorator: register a query builder under `name` with its oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco
