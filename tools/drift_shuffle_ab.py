"""A/B shuffle-bytes measurement behind the SCALE.md round-13
`embedding_drift` rework row: the ORIGINAL dim-exploded-join plan
(kept verbatim below as the baseline, same policy as
paragraph_shuffle_ab.py) vs the registered array-level-join plan.
Both materialize the full 5-column report (collect — output is |dims|
rows, tiny) and run with auto-broadcast OFF so the snapshot join
strategy measured is the one a corpus-scale run gets (neither
snapshot is broadcastable at 100 TB).

Usage: python tools/drift_shuffle_ab.py [sf_dir]
  (default .scale_data/sf1; regenerate via tools/make_scale_fixtures.py)

Expected shape (sf1, dim-64 embeddings): old plan shuffles ~2x64
narrow (vec_id, dim, micro) rows per vector through the join; new
plan shuffles one array payload per side per vector — several-fold
fewer join-exchange bytes and 64x fewer join rows, identical report.
The gap widens linearly with dim (the registry's dim-1024 path in
semantic_topk_dim1024 would see ~16x the row-count ratio shown here).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from longdoc_stress import shuffle_write_bytes  # noqa: E402
from semantic_query_engine_spark.queries import REGISTRY  # noqa: E402
from semantic_query_engine_spark.sources.fixtures import load_table  # noqa: E402


def embedding_drift_carry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRE-rework embedding_drift, verbatim: both snapshots posexplode
    to (vec_id, dim, value) rows BEFORE the equi-join on (vec_id, dim),
    so the join exchange moves |dims| narrow rows per vector per side.
    Kept ONLY here as the A/B baseline; the registered operator is the
    array-level-join plan in queries/semantic.py."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cur = emb.select("vec_id", F.posexplode("v").alias("dim", "x"))
    prev = cur.select(
        "vec_id",
        "dim",
        F.when(
            (F.col("vec_id") % 10 == 0) & (F.col("dim") < 4),
            F.col("x") + F.lit(0.25),
        )
        .otherwise(F.col("x"))
        .alias("y"),
    )
    micro = lambda c: F.round(c * 1000000).cast("long")  # noqa: E731
    j = cur.join(prev, ["vec_id", "dim"])
    return j.groupBy(F.col("dim").cast("int").alias("dim")).agg(
        F.count("*").alias("n"),
        F.sum(micro(F.col("x"))).alias("cur_sum_micro"),
        F.sum(micro(F.col("y"))).alias("prev_sum_micro"),
        F.sum(micro(F.col("x") - F.col("y"))).alias("shift_sum_micro"),
        F.sum(F.abs(micro(F.col("x") - F.col("y")))).alias(
            "abs_shift_sum_micro"
        ),
    )


def build_session() -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("drift-shuffle-ab")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        # corpus-scale regime: neither snapshot may broadcast
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scale_data/sf1"
    )
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    plans = {
        "old_dim_exploded_join": embedding_drift_carry,
        "new_array_level_join (registered)": REGISTRY["embedding_drift"].fn,
    }
    reports = {}
    for label, fn in plans.items():
        before = shuffle_write_bytes(spark)
        t0 = time.time()
        rows = sorted(
            fn(spark, sf_dir).collect(), key=lambda r: r["dim"]
        )
        wall = time.time() - t0
        mb = (shuffle_write_bytes(spark) - before) / 1e6
        reports[label] = [tuple(r) for r in rows]
        print(
            f"{label}: {mb:.2f} MB total shuffle, {wall:.2f} s wall, "
            f"{len(rows)} dims, abs_shift_total="
            f"{sum(r['abs_shift_sum_micro'] for r in rows)}"
        )
    assert len(set(map(tuple, reports.values()))) == 1, (
        f"plans disagree: {reports}"
    )
    print("outputs identical across plans")


if __name__ == "__main__":
    main()
