"""Stage-time split of the registered ann_ivfpq_topk row (VERDICT r9 #4).

The registered row drifted 2.75 s (r8) -> 3.45 s (r9 quiet re-run)
after the round-9 shared-sample refactor (one sample_vectors pull now
feeds both build_ivf and build_pq).  This tool separates the row into
its sequential stages and times each in isolation at sf0.1 so the
drift can be attributed to a specific stage rather than argued:

  1. plant      — _planted_query_index materialization (scan + 3 unions)
  2. sample     — sample_vectors driver pull (<= 2048 rows via Arrow)
  3. kmeans     — build_ivf centroid fit from the pulled sample (driver
                  BLAS Lloyd) + cluster assignment materialization
  4. pq_train   — build_pq codebook fit from the same sample
  5. encode     — pq_encode code table materialization
  6. probe      — ivfpq_topk over the built artifacts
  7. gate       — exact top-3 + recall attach (_checked_ann_topk)
  8. full       — the registered row end-to-end (cross-check: stages
                  should roughly sum to this, minus plan-reuse effects)

Protocol: one session, one untimed warmup of the full row (codegen),
then median of SPARK_GRAFT_BENCH_RUNS (default 3) per stage.  Stages
are timed by materializing ONLY up to that stage (count/collect), so
earlier-stage work repeats inside later stages — the numbers are
cumulative-shape, read the deltas.

Usage: python tools/profile_ivfpq.py [sf_dir]
Prints one JSON object {stage: sec}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS",
        "--conf spark.ui.showConsoleProgress=false pyspark-shell",
    )
    from semantic_query_engine_spark.operators.ann import (
        build_ivf,
        sample_vectors,
    )
    from semantic_query_engine_spark.operators.pq import (
        build_pq,
        ivfpq_topk,
        pq_encode,
    )
    from semantic_query_engine_spark.queries.dedup_q import (
        _checked_ann_topk,
        _planted_query_index,
        ann_ivfpq_topk,
    )
    from semantic_query_engine_spark.session import get_spark

    spark = get_spark("profile-ivfpq")
    spark.sparkContext.setLogLevel("ERROR")

    ann_ivfpq_topk(spark, sf_dir).count()  # untimed codegen warmup

    def stage_plant():
        index, _ = _planted_query_index(spark, sf_dir)
        index.count()

    def stage_sample():
        index, _ = _planted_query_index(spark, sf_dir)
        sample_vectors(index)

    def stage_kmeans():
        index, _ = _planted_query_index(spark, sf_dir)
        X = sample_vectors(index)
        assigned, _ = build_ivf(index, n_clusters=8, sample_X=X)
        assigned.count()

    def stage_pq_train():
        index, _ = _planted_query_index(spark, sf_dir)
        X = sample_vectors(index)
        build_pq(index, m=8, k=16, sample_X=X)

    def stage_encode():
        index, _ = _planted_query_index(spark, sf_dir)
        X = sample_vectors(index)
        books = build_pq(index, m=8, k=16, sample_X=X)
        pq_encode(index, books).count()

    def stage_probe():
        index, qvec = _planted_query_index(spark, sf_dir)
        X = sample_vectors(index)
        assigned, centroids = build_ivf(index, n_clusters=8, sample_X=X)
        books = build_pq(index, m=8, k=16, sample_X=X)
        enc = pq_encode(index, books)
        ivfpq_topk(
            assigned, centroids, enc, index, books, qvec,
            k=3, nprobe=4, refine=100,
        ).count()

    def stage_gate():
        index, qvec = _planted_query_index(spark, sf_dir)
        X = sample_vectors(index)
        assigned, centroids = build_ivf(index, n_clusters=8, sample_X=X)
        books = build_pq(index, m=8, k=16, sample_X=X)
        enc = pq_encode(index, books)
        approx = ivfpq_topk(
            assigned, centroids, enc, index, books, qvec,
            k=3, nprobe=4, refine=100,
        ).select("vec_id")
        _checked_ann_topk(index, qvec, approx).count()

    def stage_full():
        ann_ivfpq_topk(spark, sf_dir).count()

    stages = [
        ("plant", stage_plant),
        ("sample", stage_sample),
        ("kmeans", stage_kmeans),
        ("pq_train", stage_pq_train),
        ("encode", stage_encode),
        ("probe", stage_probe),
        ("gate", stage_gate),
        ("full", stage_full),
    ]
    out = {}
    for name, fn in stages:
        samples = []
        for _ in range(RUNS):
            t0 = time.time()
            fn()
            samples.append(time.time() - t0)
        out[name] = round(sorted(samples)[len(samples) // 2], 3)
        print(f"# {name}: {out[name]}s", file=sys.stderr)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
