"""Smoke tests: the driver contract works end-to-end on sf0.001."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows(spark):
    mod = _load_entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    row = rows[0].asDict()
    assert row["n_docs"] >= 1
    assert "--- Document ID:" in row["context"]
    assert row["answer"].startswith("Based on")


def test_every_query_has_callable_and_runs(spark, sf_dir):
    mod = _load_entry_module()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        # schema must be resolvable and the plan executable
        assert df.columns, name
        df.limit(5).collect()
