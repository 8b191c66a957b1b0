"""ANN probe at 100x data — the sub-linear counterpart of
semantic_topk_dim1024's linear-by-design brute-force row (SCALE.md
sf10 table: 50.2x wall-clock at 100x data).

Builds the write_ivf_index cluster-partitioned layout with n_clusters
scaled ~sqrt(n) (the standard IVF sizing: probe cost ~ nprobe * n /
n_clusters, so sqrt(n) cells keep per-probe work ~sqrt(n)), then times
ONLY the per-query probe (ivf_topk over the read-back layout, file-
level dynamic partition pruning doing the index's job).  Build + write
are untimed: at 100 TB the index is built once and probed millions of
times — the per-query number is what a serving path pays.

Protocol matches tools/scale_run.py: fresh session per sf, one untimed
warmup probe, median of SPARK_GRAFT_BENCH_RUNS (default 3).  Probe
recall is not re-measured here — the layout path is bit-identical to
the unpartitioned ivf_topk (tests/test_ivf_partition_pruning.py) and
the IVF accuracy gates live in the registered ann_* rows.

Usage: python tools/scale_ann_probe.py [small_sf_dir] [big_sf_dir]
Prints one JSON object {sf_dir: {n, n_clusters, probe_s}}.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from semantic_query_engine_spark.operators.ann import (  # noqa: E402
    build_ivf,
    ivf_topk,
    read_ivf_index,
    write_ivf_index,
)
from semantic_query_engine_spark.scratch import scratch_path  # noqa: E402
from semantic_query_engine_spark.session import get_spark  # noqa: E402
from semantic_query_engine_spark.sources.fixtures import load_table  # noqa: E402

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def measure(sf_dir: str) -> dict:
    spark = get_spark("scale-ann-probe")
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        .repartition(32)  # same input conditioning as the other sweeps
    )
    n = emb.count()
    n_clusters = max(8, int(math.isqrt(n)))
    # min(vec_id), not a hardcoded 0: a supplied sf_dir without vec_id 0
    # previously died on head()=None with an opaque TypeError (ADVICE r9)
    qrow = emb.orderBy("vec_id").head()
    assert qrow is not None, f"embeddings table in {sf_dir} is empty"
    qvec = [float(x) for x in qrow["embedding"]]
    # training sample must comfortably exceed the cell count
    assigned, centroids = build_ivf(
        emb, n_clusters=n_clusters, sample=max(2048, 20 * n_clusters)
    )
    path = scratch_path("ann_probe_" + os.path.abspath(sf_dir).replace("/", "_"))
    write_ivf_index(assigned, path)
    cpath = path + "_centroids"
    centroids.write.mode("overwrite").parquet(cpath)

    layout = read_ivf_index(spark, path)
    cents = spark.read.parquet(cpath)
    ivf_topk(layout, cents, qvec, k=3, nprobe=2).count()  # warmup
    samples = []
    for _ in range(RUNS):
        t0 = time.time()
        ivf_topk(layout, cents, qvec, k=3, nprobe=2).count()
        samples.append(time.time() - t0)
    spark.stop()
    return {
        "n": n,
        "n_clusters": n_clusters,
        "probe_s": round(sorted(samples)[len(samples) // 2], 3),
    }


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".scale_data/sf10"
    )
    out = {}
    for sf_dir in (small, big):
        out[sf_dir] = measure(sf_dir)
        print(f"# {sf_dir}: {out[sf_dir]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
