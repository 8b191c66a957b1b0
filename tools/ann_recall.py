"""ANN recall harness: quantify LSH / IVF quality against exact brute
force — recall@k over a probe set, plus candidate-scan fractions for
IVF (the sublinearity evidence).

Usage: python tools/ann_recall.py [sf_dir] [n_probes] [k]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from semantic_query_engine_spark.operators.ann import (  # noqa: E402
    build_ivf,
    ivf_knn_join,
)
from semantic_query_engine_spark.operators.retrieval import knn_join  # noqa: E402
from semantic_query_engine_spark.session import get_spark  # noqa: E402
from semantic_query_engine_spark.sources.fixtures import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_probes = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark("ann-recall")
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    index = emb.filter(F.col("vec_id") >= n_probes)
    n_index = index.count()

    exact = knn_join(probes, index, k=k)
    exact_sets = {
        r.probe_id: set()
        for r in exact.select("probe_id").distinct().collect()
    }
    for r in exact.collect():
        exact_sets[r.probe_id].add(r.vec_id)

    n_clusters = 16
    assigned, centroids = build_ivf(index, n_clusters=n_clusters)
    out: dict[str, object] = {
        "sf_dir": sf_dir,
        "n_index": n_index,
        "n_probes": n_probes,
        "k": k,
        "n_clusters": n_clusters,
    }
    for nprobe in (2, 4, 8):
        approx = ivf_knn_join(probes, assigned, centroids, k=k, nprobe=nprobe)
        approx_sets: dict[int, set] = {}
        for r in approx.collect():
            approx_sets.setdefault(r.probe_id, set()).add(r.vec_id)
        recalls = [
            len(exact_sets[p] & approx_sets.get(p, set())) / len(exact_sets[p])
            for p in exact_sets
        ]
        out[f"ivf_recall_at_{k}_nprobe{nprobe}"] = round(
            sum(recalls) / len(recalls), 4
        )
        out[f"ivf_scan_fraction_nprobe{nprobe}"] = round(nprobe / n_clusters, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
