"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = the reference's core path (semantic retrieval, chunking,
context assembly) + the scale-sensitive extensions (kNN join, dedup).
Each query is fully materialized via a count/collect so the timing covers
scan -> shuffle -> result, not just plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "semantic_topk",
    "semantic_topk_docs",
    "knn_join",
    "doc_chunk",
    "context_assembly",
    "text_stats",
    "doc_fingerprint",
    "cache_probe",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from semantic_query_engine_spark.queries import REGISTRY
    from semantic_query_engine_spark.session import get_spark

    spark = get_spark("bench")
    timings: dict[str, float] = {}
    names = [n for n in HEADLINE if n in REGISTRY]
    # warm the JVM + parquet footers once so timings measure the engine,
    # not first-touch class loading
    REGISTRY[names[0]].fn(spark, sf_dir).limit(1).collect()
    for name in names:
        t0 = time.time()
        df = REGISTRY[name].fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 4)
        _ = n
    total = round(sum(timings.values()), 4)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )


if __name__ == "__main__":
    main()
