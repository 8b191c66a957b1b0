"""End-to-end facade tests: a reference user's workflow through
SemanticQueryEngine — build, ask (with memory + semantic cache),
streamed ask, tenant upload validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    from semantic_query_engine_spark.api import SemanticQueryEngine
    from semantic_query_engine_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    return SemanticQueryEngine(spark, chunk_size=32).build_from_documents(docs)


def test_ask_returns_answer_and_saves_memory(engine):
    ans = engine.ask("fast key order sort table", chat_id="chat1")
    assert ans.startswith("STUB_ANSWER[")
    assert len(engine.memory_store["chat1"]) == 1
    # second turn sees history (A21 — works because memory_store is
    # initialized, unlike the reference's missing __init__ assignment)
    ans2 = engine.ask("row data filter column", chat_id="chat1")
    assert len(engine.memory_store["chat1"]) == 2
    assert ans2.startswith("STUB_ANSWER[")


def test_semantic_cache_hit_path(engine):
    q = "group query row data slow small"
    first = engine.ask(q)
    before = engine.cache_stats()["total_hits"]
    second = engine.ask(q)  # identical query -> cosine 1.0 >= 0.96 -> cache
    assert second == first
    assert engine.cache_stats()["total_hits"] == before + 1


def test_empty_query_guard(engine):
    assert engine.ask("  ") == "No query provided."


def test_search_topk(engine):
    hits = engine.search("fast key order sort", k=3).collect()
    assert len(hits) == 3
    assert hits[0].score >= hits[1].score >= hits[2].score


def test_ask_stream_chunks_and_caches(engine):
    q = "merge part scan query table unique"
    chunks = list(engine.ask_stream(q, chunk_words=3))
    assert len(chunks) >= 1
    full = " ".join(chunks)
    assert full.startswith("STUB_ANSWER[")
    # the post-stream cache write (A26) makes the next ask a cache hit
    assert engine.ask(q) == full


def test_ask_stream_incremental_token_emission(spark, sf_dir):
    """A19 true streaming: deltas must reach the consumer BEFORE the
    generator finishes, and the cache write must wait for exhaustion."""
    from semantic_query_engine_spark.api import SemanticQueryEngine
    from semantic_query_engine_spark.sources.fixtures import load_table

    produced = []

    def stream_fn(prompt):
        for tok in ("alpha ", "beta ", "gamma"):
            produced.append(tok)
            yield tok

    docs = load_table(spark, sf_dir, "documents").limit(50).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    eng = SemanticQueryEngine(
        spark, chunk_size=32, generate_stream_fn=stream_fn
    ).build_from_documents(docs)

    q = "incremental stream probe query words"
    it = eng.ask_stream(q)
    first = next(it)
    # lazy: only the first delta has been produced when we receive it
    assert first == "alpha " and produced == ["alpha "]
    rest = list(it)
    assert rest == ["beta ", "gamma"]
    # cache-after-stream (A26): next ask returns the accumulated answer
    assert eng.ask(q) == "alpha beta gamma"


def test_upload_text_validation_and_tenancy(engine):
    with pytest.raises(ValueError):
        engine.upload_text("u1", "", "body", batch_ts=123)
    with pytest.raises(ValueError):
        engine.upload_text("u1", "notes.pdf", "body", batch_ts=123)
    doc_id = engine.upload_text("u1", "notes.txt", "alpha beta gamma", batch_ts=123)
    assert doc_id == "notes_123"
    indexed = engine.index.filter(F.col("doc_id") == doc_id).collect()
    assert indexed and all(r.user_id == "u1" for r in indexed)
