"""Full-corpus (UNBOUNDED) scale sweep for the near-dup production
operators — VERDICT r5 #2.

SCALE.md's dedup_minhash_lsh / dedup_semantic / dedup_cluster rows run
the registered queries, whose pools are bounded (doc_id < 100) for
oracle tractability; this harness times the underlying OPERATORS over
the ENTIRE corpus at sf0.1 (2k docs / 2k vectors) vs sf1 (20k / 20k),
so the 10x-data scaling of the unbounded LSH paths is measured
directly:

- minhash_full:  minhash_lsh_pairs, production xxhash64 mode, over all
  documents.  sf1 replicas differ by one suffix token, so true
  near-dup groups of 10 exist across replicas — the workload finds
  ~45 pairs per original document, a realistic crawl-dup profile.
- semantic_full: embedding_near_dups in SRP-banded mode (8 bands x 4
  bits) at cosine >= 0.98 over all embeddings (replicas are 0.001*k
  first-element perturbations -> cosine ~0.9999).
- cluster_full:  connected_components over the minhash pair set with
  driver_cc_threshold=0, FORCING the distributed alternating-star
  path (the 100 TB form) even though the edge set would fit the
  driver shortcut.

Same methodology as tools/scale_run.py: fresh SparkContext per
(workload, sf), one untimed warmup, median of SPARK_GRAFT_BENCH_RUNS
(default 3) timed runs, persistent RDDs released between runs.

Usage: python tools/scale_fullcorpus.py [small_sf_dir] [big_sf_dir]
Prints one JSON object {workload: {small, big, ratio, small_rows,
big_rows}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from semantic_query_engine_spark.session import get_spark  # noqa: E402
from semantic_query_engine_spark.sources.fixtures import load_table  # noqa: E402
from tools.harness_util import release_persistent_rdds  # noqa: E402

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def minhash_full(spark, sf_dir):
    from semantic_query_engine_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return minhash_lsh_pairs(docs, threshold=0.5, n=2)


def semantic_full(spark, sf_dir):
    from semantic_query_engine_spark.operators.dedup import embedding_near_dups

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return embedding_near_dups(emb, threshold=0.98, srp_bands=8)


def cluster_full(spark, sf_dir):
    from semantic_query_engine_spark.operators.dedup import minhash_lsh_pairs
    from semantic_query_engine_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = minhash_lsh_pairs(docs, threshold=0.5, n=2)
    return connected_components(pairs, driver_cc_threshold=0)


WORKLOADS = {
    "minhash_full": minhash_full,
    "semantic_full": semantic_full,
    "cluster_full": cluster_full,
}


def _median_time(spark, fn, sf_dir):
    rows = fn(spark, sf_dir).count()  # untimed warmup (codegen javac)
    release_persistent_rdds(spark)
    samples = []
    for _ in range(RUNS):
        t0 = time.time()
        fn(spark, sf_dir).count()
        samples.append(time.time() - t0)
        release_persistent_rdds(spark)
    return round(sorted(samples)[len(samples) // 2], 3), rows


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".scale_data/sf1"
    )
    out = {}
    for name, fn in WORKLOADS.items():
        spark = get_spark("scale-fullcorpus")
        s, sr = _median_time(spark, fn, small)
        b, br = _median_time(spark, fn, big)
        spark.stop()
        out[name] = {
            "small": s,
            "big": b,
            "ratio": round(b / s, 2) if s else None,
            "small_rows": sr,
            "big_rows": br,
        }
        print(f"# {name}: {s}s ({sr} rows) -> {b}s ({br} rows) "
              f"({out[name]['ratio']}x)", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
