"""Bounded-retry + error-null adapter semantics (reference parity:
zero vector on embed failure, None on generation failure — the HTTP
error paths at app/embedding_gen.py:147-148 and app/main.py:223-242)."""

from __future__ import annotations

import pytest

from semantic_query_engine_spark.ml.resilience import (
    null_answer_fallback,
    with_retries,
    zero_vector_fallback,
)


class Flaky:
    """Fails the first n calls, then succeeds."""

    def __init__(self, fail_times: int):
        self.fail_times = fail_times
        self.calls = 0

    def __call__(self, batch):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise ConnectionError("transient")
        return [f"ok:{x}" for x in batch]


def test_retry_recovers_within_budget():
    fn = Flaky(fail_times=2)
    wrapped = with_retries(fn, max_retries=2, backoff_s=0.0)
    assert wrapped(["a", "b"]) == ["ok:a", "ok:b"]
    assert fn.calls == 3


def test_retry_exhaustion_uses_fallback():
    fn = Flaky(fail_times=10)
    wrapped = with_retries(
        fn, max_retries=1, backoff_s=0.0, on_exhausted=null_answer_fallback
    )
    assert wrapped(["a", "b"]) == [None, None]
    assert fn.calls == 2  # initial + 1 retry, then fallback


def test_retry_exhaustion_reraises_without_fallback():
    wrapped = with_retries(Flaky(fail_times=10), max_retries=1, backoff_s=0.0)
    with pytest.raises(ConnectionError):
        wrapped(["a"])


def test_deterministic_bug_propagates_immediately():
    """A TypeError (caller bug, not transient) must fail fast — no
    retries burned, no silent zero-vector/NULL masking."""
    calls = {"n": 0}

    def buggy(batch):
        calls["n"] += 1
        raise TypeError("shape mismatch")

    wrapped = with_retries(
        buggy, max_retries=3, backoff_s=0.0, on_exhausted=null_answer_fallback
    )
    with pytest.raises(TypeError):
        wrapped(["a"])
    assert calls["n"] == 1


def test_retryable_override_restores_degrade_on_anything():
    wrapped = with_retries(
        lambda b: (_ for _ in ()).throw(TypeError("bug")),
        max_retries=0,
        backoff_s=0.0,
        on_exhausted=null_answer_fallback,
        retryable=(Exception,),
    )
    assert wrapped(["a"]) == [None]


def test_per_row_fallback_isolates_poisoned_row():
    """One permanently-failing row degrades only itself; batch-mates
    still get real results."""

    def poisoned(batch):
        if any(x == "bad" for x in batch):
            raise ConnectionError("poisoned row")
        return [f"ok:{x}" for x in batch]

    wrapped = with_retries(
        poisoned,
        max_retries=1,
        backoff_s=0.0,
        on_exhausted=null_answer_fallback,
        per_row_fallback=True,
    )
    assert wrapped(["a", "bad", "c"]) == ["ok:a", None, "ok:c"]


def test_per_row_fallback_off_degrades_whole_batch():
    def poisoned(batch):
        if any(x == "bad" for x in batch):
            raise ConnectionError("poisoned row")
        return [f"ok:{x}" for x in batch]

    wrapped = with_retries(
        poisoned, max_retries=1, backoff_s=0.0, on_exhausted=null_answer_fallback
    )
    assert wrapped(["a", "bad", "c"]) == [None, None, None]


def test_embedder_per_row_fallback(spark):
    """Through the Arrow UDF: only the poisoned text gets a zero
    vector."""
    from semantic_query_engine_spark.ml.embedder import embed_with_pandas_udf

    def poisoned(texts):
        if any("bad" in t for t in texts):
            raise ConnectionError("poisoned")
        return [[1.0] * 4 for _ in texts]

    docs = spark.createDataFrame(
        [(1, "hello"), (2, "bad doc"), (3, "world")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: r.embedding
        for r in embed_with_pandas_udf(
            docs,
            embed_fn=poisoned,
            dim=4,
            max_retries=0,
            backoff_s=0.0,
            per_row_fallback=True,
        ).collect()
    }
    assert out[1] == [1.0] * 4 and out[3] == [1.0] * 4
    assert out[2] == [0.0] * 4


def test_zero_vector_fallback_shape():
    fb = zero_vector_fallback(4)
    assert fb(["x", "y"]) == [[0.0] * 4, [0.0] * 4]


def test_embedder_degrades_to_zero_vectors(spark):
    """End-to-end through the Arrow UDF: a permanently-failing embed_fn
    must yield zero vectors, not a task failure."""
    from semantic_query_engine_spark.ml.embedder import embed_with_pandas_udf

    def always_fails(texts):
        raise ConnectionError("service down")

    docs = spark.createDataFrame([(1, "hello"), (2, "world")], ["doc_id", "text"])
    out = embed_with_pandas_udf(
        docs, embed_fn=always_fails, dim=4, max_retries=1, backoff_s=0.0
    ).collect()
    assert all(r.embedding == [0.0] * 4 for r in out)


def test_generator_degrades_to_null_answers(spark):
    from semantic_query_engine_spark.ml.generator import generate_with_pandas_udf

    def always_fails(batch):
        raise TimeoutError("service down")

    prompts = spark.createDataFrame([(1, "p1"), (2, "p2")], ["id", "prompt"])
    out = generate_with_pandas_udf(
        prompts, generate_fn=always_fails, max_retries=1, backoff_s=0.0
    ).collect()
    assert all(r.answer is None for r in out)
