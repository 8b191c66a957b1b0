"""Parity against the reference's OWN corpus: the ingest path (A3+A1+A2)
must reproduce the reference's measured corpus stats — 3,027 PMC files,
~15.9M words, ≈31k 512-word chunks (BASELINE.md 'Shipped corpus size' /
'Derived index size')."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

PMC_DIR = "/root/reference/PMC"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(PMC_DIR), reason="reference corpus not present"
)


def test_corpus_ingest_parity(spark):
    from semantic_query_engine_spark.operators.chunking import chunk_documents
    from semantic_query_engine_spark.sources.text_corpus import read_text_corpus

    docs = read_text_corpus(spark, PMC_DIR)
    assert docs.count() == 3027  # BASELINE.md: 3,027 files

    chunks = chunk_documents(docs, chunk_size=512)
    n_chunks = chunks.count()
    # ~15.9M words / 512 ≈ 31k, plus per-doc ceil rounding => low 30k's
    assert 31_000 <= n_chunks <= 34_000, n_chunks

    # chunk contract on a sample: <=512 words each, composite keys well-formed
    sample = chunks.filter(F.col("doc_id").endswith("7")).limit(200).collect()
    assert sample
    for r in sample:
        assert len(r.chunk_text.split()) <= 512
        assert r.chunk_key == f"{r.doc_id}_{r.chunk_id}"


def test_latin1_fallback_byte_faithful(spark, tmp_path):
    """The faithful source must reproduce the reference's decode chain
    EXACTLY (app/main.py:430-437): whole-file UTF-8, else whole-file
    latin-1 — byte-for-byte, including bytes that are invalid UTF-8."""
    from semantic_query_engine_spark.sources.text_corpus import (
        read_text_corpus_faithful,
    )

    bad = b"caf\xe9 latin-1 only \xff\xfe tail"
    good = "café plain utf-8".encode("utf-8")
    (tmp_path / "PMC1.txt").write_bytes(bad)
    (tmp_path / "PMC2.txt").write_bytes(good)
    (tmp_path / "ignored.txt").write_bytes(b"filtered out")

    rows = {
        r.doc_id: r.text
        for r in read_text_corpus_faithful(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {"PMC1", "PMC2"}
    assert rows["PMC1"] == bad.decode("latin-1")
    assert rows["PMC2"] == good.decode("utf-8")
