"""A/B behind the round-13 winnow_fingerprints rework: the ORIGINAL
explode-anchors + (doc, pos) join-back plan (kept verbatim below as
the baseline, same policy as paragraph_shuffle_ab.py) vs the
registered two-window plan.  The join plan is CORRECT but Catalyst's
size estimate (from the small parquet file) judged the
corpus-token-sized spans side broadcastable at sf1 and built a
~150 MB hashed relation — the one super-linear row (13.4x at 10x
data) of the r13 isolated re-measurement.  The rework removes the
join entirely: selection is max(mh) over a leading window == own h.

Asserts the two plans' output SETS are identical (the join plan can
emit duplicate (doc,pos) rows pre-distinct; both are distinct-ed for
the compare) and prints wall + shuffle bytes for each at the given SF.

Usage: python tools/winnow_plan_ab.py [sf_dir]
  (default .scale_data/sf1)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from longdoc_stress import shuffle_write_bytes  # noqa: E402
from semantic_query_engine_spark.functions.text import words_of  # noqa: E402
from semantic_query_engine_spark.queries import REGISTRY  # noqa: E402
from semantic_query_engine_spark.queries.curation_q import _K, _WINNOW_W  # noqa: E402
from semantic_query_engine_spark.sources.fixtures import load_table  # noqa: E402


def winnow_join_carry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRE-rework winnow_fingerprints, verbatim: W-way anchor explode +
    equi-join back to spans.  Kept ONLY here as the A/B baseline."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", words_of(F.col("text")).alias("w")
    )
    spans = (
        docs.filter(F.size("w") >= _K)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size("w") - (_K - 1))).alias("pos"),
            F.col("w"),
        )
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.md5(F.array_join(F.slice(F.col("w"), F.col("pos"), _K), " ")).alias("h"),
        )
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(_WINNOW_W - 1), 0)
    )
    anchors = (
        spans.withColumn("mh", F.min("h").over(win))
        .filter(F.col("pos") >= _WINNOW_W)
        .select("doc_id", F.col("pos").alias("a"), "mh")
    )
    cand = anchors.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_WINNOW_W - 1)),
                lambda o: F.col("a") - o.cast("long"),
            )
        ).alias("pos"),
        "mh",
    )
    return (
        cand.join(spans, ["doc_id", "pos"])
        .filter(F.col("h") == F.col("mh"))
        .select("doc_id", "pos", F.col("h").alias("fp"))
        .distinct()
    )


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_UI", "true")
    from semantic_query_engine_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scale_data/sf1"
    )
    spark = get_spark("winnow-plan-ab")
    spark.sparkContext.setLogLevel("ERROR")
    plans = {
        "old_explode_join": winnow_join_carry,
        "new_two_windows (registered)": REGISTRY["winnow_fingerprints"].fn,
    }
    sigs = {}
    for label, fn in plans.items():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        before = shuffle_write_bytes(spark)
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        mb = (shuffle_write_bytes(spark) - before) / 1e6
        # order-independent set fingerprint of the output
        row = (
            fn(spark, sf_dir)
            .distinct()
            .agg(
                F.count("*").alias("n"),
                F.sum(
                    F.xxhash64("doc_id", "pos", "fp").cast("decimal(38,0)")
                ).alias("sig"),
            )
            .collect()[0]
        )
        sigs[label] = (row["n"], row["sig"])
        print(f"{label}: {wall:.2f} s wall, {mb:.2f} MB shuffle, "
              f"{row['n']} fingerprints")
    assert len(set(sigs.values())) == 1, f"plans disagree: {sigs}"
    print("outputs identical across plans")


if __name__ == "__main__":
    main()
