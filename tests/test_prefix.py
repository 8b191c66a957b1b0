"""Hierarchical exclusive prefix sum (operators/prefix.py) — the
O(S log S) shard-offset machinery behind pack_sequences /
training_data_prep.  The base case closes any frame of ≤ width² rows
with one window pass; small widths force multi-level recursion so the
tests cover the path fixture-scale queries never reach."""

from __future__ import annotations

from pyspark.sql import functions as F

from semantic_query_engine_spark.operators.prefix import exclusive_prefix_sum


def _naive(rows, part=None):
    """{(part, key): sum of vals with smaller key in the same part}."""
    out = {}
    for p, k, _ in rows:
        out[(p, k)] = sum(v for q, j, v in rows if q == p and j < k)
    return out


def test_prefix_sum_base_case_matches_naive(spark):
    rows = [(0, k, (k * 7) % 13 + 1) for k in range(10)]
    df = spark.createDataFrame(rows, ["p", "key", "val"])
    got = {
        (0, r.key): r.offset
        for r in exclusive_prefix_sum(df, "key", "val", width=128).collect()
    }
    assert got == _naive(rows)


def test_prefix_sum_recursive_levels_match_naive(spark):
    """width=4 over 50 sparse keys → recursion above the width²=16 base
    case (50 → ~37 sup keys → ≤16, two recursive levels)."""
    keys = [3 * k + (k % 2) for k in range(50)]  # sparse, increasing
    rows = [(0, k, (k * 11) % 17 + 1) for k in keys]
    df = spark.createDataFrame(rows, ["p", "key", "val"])
    got = {
        (0, r.key): r.offset
        for r in exclusive_prefix_sum(df, "key", "val", width=4).collect()
    }
    assert got == _naive(rows)


def test_prefix_sum_partitioned_recursive(spark):
    """Per-partition prefix sums stay independent across groups."""
    rows = [
        (p, k, (100 if p == "a" else 200) + k + 1)
        for p in ("a", "b")
        for k in range(30)
    ]
    df = spark.createDataFrame(rows, ["grp", "key", "val"])
    got = {
        (r.grp, r.key): r.offset
        for r in exclusive_prefix_sum(
            df, "key", "val", part_cols=("grp",), width=4
        ).collect()
    }
    naive = {}
    for p, k, _ in rows:
        naive[(p, k)] = sum(v for q, j, v in rows if q == p and j < k)
    assert got == naive


def test_prefix_sum_property_random_frames(spark):
    """Property: for arbitrary sparse keys/values/widths the hierarchical
    result equals the naive prefix sum (one combined example set to keep
    Spark round trips bounded)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=5, deadline=None)
    @given(
        kv=st.dictionaries(
            st.integers(min_value=0, max_value=10_000),
            st.integers(min_value=1, max_value=1_000),
            min_size=1,
            max_size=60,
        ),
        width=st.sampled_from([2, 3, 7, 128]),
    )
    def check(kv, width):
        rows = [(0, k, v) for k, v in kv.items()]
        df = spark.createDataFrame(rows, ["p", "key", "val"])
        got = {
            (0, r.key): r.offset
            for r in exclusive_prefix_sum(df, "key", "val", width=width).collect()
        }
        assert got == _naive(rows)

    check()


def test_pack_sequences_cum_tokens_is_global_running_sum(spark, sf_dir):
    """End-to-end: cum_tokens over doc_id order must equal the naive
    global running sum of n_tokens."""
    from semantic_query_engine_spark.queries.mlpipeline_q import pack_sequences

    rows = sorted(
        pack_sequences(spark, sf_dir).collect(), key=lambda r: r.doc_id
    )
    run = 0
    for r in rows:
        run += r.n_tokens
        assert r.cum_tokens == run
