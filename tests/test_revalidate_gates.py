"""tools/revalidate_gates.py: the fixture-regen gate revalidator.

VERDICT r6 "What's wrong" #1: the six ANN/LSH rows and the sketch
rows hardcode `TRUE AS recall_ok` / `TRUE AS within_tol` in their
oracles, so a regenerated fixture that legitimately flips a gate
presents as a mysterious driver hash failure.  The revalidator must
(a) discover exactly the hardcoded-TRUE rows, (b) pass on the
committed fixtures, and (c) catch a deliberately broken gate — the
falsifiability proof.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from semantic_query_engine_spark.queries import REGISTRY, QuerySpec
from tools.revalidate_gates import check_gates, gated_queries


def test_discovers_the_known_gated_queries():
    targets = gated_queries(REGISTRY)
    # the six accuracy-gated ANN/LSH rows (VERDICT r6 operator table A15)
    for name in (
        "dedup_minhash_lsh",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "ann_pq_topk",
        "ann_ivfpq_topk",
        "ann_ivf_knn_join",
    ):
        assert targets.get(name) == ["recall_ok"], name
    # the tolerance-gated sketch/approx rows
    assert "hll_union_rollup" in targets
    # r9: the pattern is generic (any hardcoded-TRUE boolean column is
    # a gate, ADVICE r8), so the gates that previously escaped under
    # non-standard names are discovered too
    assert targets.get("cms_frequency") == ["cms_ok"]
    assert targets.get("xml_funcs") == ["roundtrip_ok"]
    # r14: the built-clusters SemDeDup row earns TWO gates in-plan
    # (clustering is not SQL-twinnable, so both are hardcoded TRUE in
    # the oracle and recomputed on the Spark side)
    assert sorted(targets.get("dedup_semdedup_built", [])) == [
        "one_keep_per_component_ok",
        "planted_recall_ok",
    ]
    known = {
        "within_tol",
        "recall_ok",
        "cms_ok",
        "roundtrip_ok",
        "planted_recall_ok",
        "one_keep_per_component_ok",
    }
    assert all(c in known for cs in targets.values() for c in cs), targets
    # nothing un-gated sneaks in: every discovered oracle really
    # hardcodes the gate
    for name in targets:
        assert "TRUE" in REGISTRY[name].oracle.upper()


def _fake_spec(name: str, fn) -> QuerySpec:
    return QuerySpec(
        name=name,
        fn=fn,
        oracle="SELECT 1 AS x, TRUE AS recall_ok",
        doc="deliberately broken gate for the falsifiability test",
    )


def test_catches_a_deliberately_broken_gate(spark, sf_dir):
    """A query whose computed gate is false must fail revalidation."""

    def broken(s, _sf):
        return s.range(3).select(
            F.col("id").alias("x"), (F.col("id") < 1).alias("recall_ok")
        )

    registry = {"broken_gate": _fake_spec("broken_gate", broken)}
    failures = check_gates(spark, registry, sf_dir, verbose=False)
    assert len(failures) == 1
    assert "broken_gate" in failures[0]
    assert "hash-mismatch" in failures[0]


def test_catches_a_null_gate_and_empty_result(spark, sf_dir):
    """NULL gate values and 0-row results are failures, not passes."""

    def nullish(s, _sf):
        return s.range(2).select(
            F.lit(None).cast("boolean").alias("recall_ok")
        )

    def empty(s, _sf):
        return s.range(0).select(F.lit(True).alias("within_tol"))

    registry = {
        "null_gate": _fake_spec("null_gate", nullish),
        "empty_gate": QuerySpec(
            "empty_gate", empty, "SELECT TRUE AS within_tol", ""
        ),
    }
    failures = check_gates(spark, registry, sf_dir, verbose=False)
    assert len(failures) == 2
    assert any("null_gate" in f for f in failures)
    assert any("vacuously" in f for f in failures)


def test_passing_gate_produces_no_failures(spark, sf_dir):
    def good(s, _sf):
        return s.range(4).select(F.lit(True).alias("recall_ok"))

    registry = {"good_gate": _fake_spec("good_gate", good)}
    assert check_gates(spark, registry, sf_dir, verbose=False) == []
