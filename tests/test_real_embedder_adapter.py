"""Real-model adapter smoke (VERDICT r6 #7, stretch).

ml/embedder.py's docstrings promise any real embedding model slots
into `embed_with_pandas_udf` as `embed_fn: list[str] ->
list[list[float]]`.  This proves the swap with whatever real model is
importable — sentence-transformers, or a plain HTTP client — and
skips cleanly where none is installed (this sandbox ships no model
weights; the interface contract itself is pinned by the always-run
fake-model test below).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from semantic_query_engine_spark.ml.embedder import embed_with_pandas_udf


def _load_real_model():
    try:
        from sentence_transformers import SentenceTransformer  # noqa: PLC0415
    except Exception:  # noqa: BLE001  (ImportError or broken native deps)
        return None
    try:
        return SentenceTransformer("all-MiniLM-L6-v2")
    except Exception:  # noqa: BLE001  (no weights cached, no network)
        return None


def test_real_model_adapter_smoke(spark, sf_dir):
    model = _load_real_model()
    if model is None:
        pytest.skip("no real embedding model installed/cached in this env")
    dim = model.get_sentence_embedding_dimension()

    def embed_fn(texts: list[str]) -> list[list[float]]:
        return [[float(x) for x in v] for v in model.encode(texts)]

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(8)
    out = embed_with_pandas_udf(docs, embed_fn=embed_fn, dim=dim).select(
        "doc_id", "embedding"
    )
    rows = out.collect()
    assert len(rows) == 8
    assert all(len(r["embedding"]) == dim for r in rows)
    assert any(np.linalg.norm(r["embedding"]) > 0 for r in rows)


def test_adapter_contract_with_model_shaped_fake(spark, sf_dir):
    """Always runs: a model-shaped callable (batch in, matrix out,
    fixed dim, no per-row calls) goes through the SAME adapter path a
    real model would — batch plumbing, empty-text zero-vector guard,
    array<double> schema."""
    dim = 16

    def fake_model_encode(texts: list[str]) -> list[list[float]]:
        out = np.zeros((len(texts), dim))
        for i, t in enumerate(texts):
            if t.strip():
                out[i, len(t) % dim] = 1.0
        # smuggle the batch size out in the last element: the UDF runs
        # in a worker process, so a driver-side call counter never sees
        # its mutations — the output itself must carry the evidence
        out[:, dim - 1] = len(texts)
        return [[float(x) for x in row] for row in out]

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, "gamma")], "doc_id long, text string"
    ).repartition(1)
    rows = {
        r["doc_id"]: r["embedding"]
        for r in embed_with_pandas_udf(docs, embed_fn=fake_model_encode, dim=dim)
        .select("doc_id", "embedding")
        .collect()
    }
    assert set(rows) == {1, 2, 3}
    assert all(len(v) == dim for v in rows.values())
    # empty-text rows reach the model too (the zero-vector GUARD is the
    # model's/adapter's job only on error paths); text rows are encoded
    assert rows[1][len("alpha beta") % dim] == 1.0
    assert rows[3][len("gamma") % dim] == 1.0
    assert sum(rows[2][:-1]) == 0.0  # empty text encodes to nothing
    # batched, not per-row: all 3 rows of the single partition arrived
    # in ONE encode call (the smuggled batch size says so)
    assert all(v[dim - 1] == 3.0 for v in rows.values())
