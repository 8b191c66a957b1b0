"""Measure v4 scale-fixture SRP sign diversity at sf100 replica counts
(VERDICT r10 #4): run `semantic_full`'s actual SRP banding
(operators/dedup.srp_band_table, 8 bands x 4 bits, the 0.98-threshold
path's parameters) over a >128-replica fixture and report

  - distinct embeddings per base-vector family (must equal the replica
    count: v3 at 1000 replicas collapsed to ~128 distinct vectors per
    family, every mod-128 class bit-identical),
  - the same-base SRP band-collision count (v3's bit-identical pairs
    collide in ALL bands by construction; v4's hashed diagonals should
    push this toward the random-vector rate),
  - global LSH bucket stats (max occupancy, would-be candidate-pair
    volume) — the r8 bucket-blowup monitor numbers.

Usage: python tools/v4_sign_diversity.py [fixture_dir] [replicas]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from semantic_query_engine_spark.operators.dedup import srp_band_table  # noqa: E402
from semantic_query_engine_spark.session import get_spark  # noqa: E402


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else ".scale_data/sf100slice"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    spark = get_spark("v4-sign-diversity")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(os.path.join(fixture, "embeddings.parquet"))
    base = (F.col("vec_id") % 1_000_000).alias("base")

    # 1. family distinctness: every replica of a base vector must be a
    # DISTINCT vector (v3 reused transforms past 128 -> bit-identical)
    fam = (
        emb.select(base, F.hash("embedding").alias("h"))
        .groupBy("base")
        .agg(F.count("*").alias("n"), F.countDistinct("h").alias("nd"))
        .agg(
            F.count("*").alias("families"),
            F.min("nd").alias("min_distinct"),
            F.sum(F.when(F.col("nd") < F.col("n"), 1).otherwise(0)).alias(
                "families_with_hash_dup"
            ),
        )
        .collect()[0]
    )

    # 2. semantic_full's SRP banding (8 bands x 4 bits over 64-d)
    bt = srp_band_table(emb, n_bands=8, bits=4, dim=64).cache()
    occ = bt.groupBy("band", "key").agg(F.count("*").alias("c"))
    glob = occ.agg(
        F.max("c").alias("max_bucket"),
        F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("cand_pairs"),
        F.count("*").alias("buckets"),
    ).collect()[0]

    # 3. same-base band collisions: pairs of replicas of one base vector
    # sharing a (band, key).  v3's bit-identical mod-128 classes at this
    # replica count collide in all 8 bands: 8 * (104*C(8,2) + 24*C(7,2))
    # per base = the counterfactual printed alongside.
    b = bt.withColumn("base", F.col("id") % 1_000_000)
    same = (
        b.alias("x")
        .join(b.alias("y"), ["band", "key", "base"])
        .filter(F.col("x.id") < F.col("y.id"))
        .count()
    )
    bt.unpersist()
    full, part = divmod(replicas, 128)
    v3_identical_pairs_per_base = (128 - part) * full * (full - 1) // 2 + part * (
        full + 1
    ) * full // 2
    # expectation if replicas were UNRELATED vectors: candidate pairs x
    # the fraction of all pairs that are same-base.  measured/expected
    # ~= 1.0 means the diagonals fully decorrelate SRP signs.
    n_vec = fam["families"] * replicas
    same_base_pairs = fam["families"] * replicas * (replicas - 1) // 2
    all_pairs = n_vec * (n_vec - 1) // 2
    expected_random = glob["cand_pairs"] * same_base_pairs / all_pairs
    out = {
        "fixture": fixture,
        "replicas": replicas,
        "families": fam["families"],
        "min_distinct_vectors_per_family": fam["min_distinct"],
        "families_with_hash_dup": fam["families_with_hash_dup"],
        "srp_max_bucket": glob["max_bucket"],
        "srp_candidate_pairs": glob["cand_pairs"],
        "srp_buckets": glob["buckets"],
        "same_base_band_collisions": same,
        "expected_if_unrelated": int(expected_random),
        "measured_over_expected": round(same / expected_random, 4),
        "v3_counterfactual_same_base_all_band_collisions": 8
        * v3_identical_pairs_per_base
        * fam["families"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
