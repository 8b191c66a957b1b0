"""Does the IVF-PQ incremental add's cost ride the BATCH or the INDEX?

append_ivfpq_index's 100-TB claim (operators/pq.py) is that ingest cost
is decoupled from index size: encode is a map-only scan of the batch
with frozen plan-constant codebooks, assignment is an Arrow-batched
argmin against a kilobyte centroid table, and the partitioned
mode('append') write touches only the batch's clusters.  This harness
measures it instead of asserting it:

  A. SAME batch (the sf0.1 corpus at +5e9 ids, 2k vectors) appended to
     a SMALL index (built over sf0.1, ~2k vectors) vs a LARGE index
     (built over sf1, ~20k vectors).  Decoupling predicts ~equal times.
  B. SMALL batch (2k) vs LARGE batch (20k) appended to the SAME large
     index.  Batch-riding predicts ~linear growth.

Each timed run appends to a FRESH copy of the pristine layout (repeated
appends would otherwise grow the target across runs); the copy is made
OUTSIDE the timed region.  Median of SPARK_GRAFT_BENCH_RUNS (default 3)
after one untimed warmup, one JVM (the workload is a write job — JVM
aging effects are secondary to the comparison being within-session).

Usage: python tools/append_throughput.py [small_sf_dir] [big_sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from semantic_query_engine_spark.session import get_spark  # noqa: E402

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
BATCH_OFFSET = 5_000_000_000  # clear of fixture replicas (k*1e6) and plants (1e9/2e9)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def _build(spark, sf_dir, path):
    from semantic_query_engine_spark.operators.ann import (
        build_ivf,
        sample_vectors,
    )
    from semantic_query_engine_spark.operators.pq import (
        build_pq,
        pq_encode,
        write_ivfpq_index,
    )

    base = _emb(spark, sf_dir)
    X = sample_vectors(base)
    assigned, centroids = build_ivf(base, n_clusters=8, sample_X=X)
    books = build_pq(base, m=8, k=16, sample_X=X)
    write_ivfpq_index(assigned, pq_encode(base, books), centroids, books, path)
    return base.count()


def _batch(spark, sf_dir):
    return _emb(spark, sf_dir).select(
        (F.col("vec_id") + F.lit(BATCH_OFFSET)).alias("vec_id"), "embedding"
    )


def _median_append(spark, batch, pristine, scratch_root, tag):
    from semantic_query_engine_spark.operators.pq import append_ivfpq_index

    samples = []
    for i in range(RUNS + 1):  # first is the untimed warmup
        target = os.path.join(scratch_root, f"{tag}_{i}")
        shutil.copytree(pristine, target)  # outside the timed region
        t0 = time.time()
        append_ivfpq_index(batch, target)
        dt = time.time() - t0
        shutil.rmtree(target, ignore_errors=True)
        if i:
            samples.append(dt)
    return round(sorted(samples)[len(samples) // 2], 3)


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".scale_data/sf1"
    )
    spark = get_spark("append-throughput")
    spark.sparkContext.setLogLevel("ERROR")
    from semantic_query_engine_spark.scratch import scratch_path

    root = scratch_path("append_throughput")
    small_idx = os.path.join(root, "idx_small")
    big_idx = os.path.join(root, "idx_big")
    n_small = _build(spark, small, small_idx)
    n_big = _build(spark, big, big_idx)

    small_batch = _batch(spark, small)
    big_batch = _batch(spark, big)
    nb_small, nb_big = small_batch.count(), big_batch.count()

    out = {
        # A: same 2k batch, 10x different index sizes
        "batch2k_into_small_idx": _median_append(
            spark, small_batch, small_idx, root, "a_small"
        ),
        "batch2k_into_big_idx": _median_append(
            spark, small_batch, big_idx, root, "a_big"
        ),
        # B: 10x different batches, same big index
        "batch20k_into_big_idx": _median_append(
            spark, big_batch, big_idx, root, "b_big"
        ),
        "n_small_idx": n_small,
        "n_big_idx": n_big,
        "n_small_batch": nb_small,
        "n_big_batch": nb_big,
    }
    out["index_size_ratio"] = round(
        out["batch2k_into_big_idx"] / out["batch2k_into_small_idx"], 2
    )
    out["batch_size_ratio"] = round(
        out["batch20k_into_big_idx"] / out["batch2k_into_big_idx"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
