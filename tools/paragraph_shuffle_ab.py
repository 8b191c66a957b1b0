"""A/B shuffle-bytes measurement behind the SCALE.md round-12
`paragraph_dedup` rework row: the ORIGINAL text-through-the-hash-join
plan (kept verbatim below as the baseline, same policy as
longdoc_stress.py's span-mask carry) vs the registered slim-shuffle
plan, both materializing clean_text (a bare .count() lets Catalyst
prune the text columns and reads ~0 shuffle — the first measurement
attempt did exactly that) and both under auto-broadcast OFF so the
join strategy measured is the one a corpus-scale run gets.

Usage: python tools/paragraph_shuffle_ab.py [sf_dir]
  (default .scale_data/sf1; regenerate via tools/make_scale_fixtures.py)

Expected shape (sf1, 50k docs, 21.2 MB text): old ~58 MB total shuffle,
new ~36 MB, byte-identical clean_text totals.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from longdoc_stress import shuffle_write_bytes  # noqa: E402
from semantic_query_engine_spark.functions.text import words_of  # noqa: E402
from semantic_query_engine_spark.queries import REGISTRY  # noqa: E402
from semantic_query_engine_spark.queries.curation_q import (  # noqa: E402
    _NEWSLETTER,
    _PARA_W,
)
from semantic_query_engine_spark.sources.fixtures import load_table  # noqa: E402


def paragraph_dedup_carry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRE-rework paragraph_dedup, verbatim: the exploded (doc_id, pos,
    TEXT) rows ride the content-hash join AND a collect_list/array_sort
    reassembly — two text-keyed exchanges.  Kept ONLY here as the A/B
    baseline; the registered operator is the slim plan in
    queries/curation_q.py."""
    docs = load_table(spark, sf_dir, "documents")
    w = words_of(F.col("text"))
    n_groups = ((F.size(w) + (_PARA_W - 1)) / _PARA_W).cast("int")
    groups = F.transform(
        F.sequence(F.lit(0), n_groups - 1),
        lambda i: F.array_join(F.slice(w, i * _PARA_W + 1, _PARA_W), " "),
    )
    planted = F.concat(
        groups,
        F.array(
            F.concat(F.lit(_NEWSLETTER), (F.col("doc_id") % 7).cast("string"))
        ),
    )
    paras0 = docs.select(
        "doc_id", F.posexplode(planted).alias("pos0", "p")
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "p")
    extra = docs.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        (n_groups + 2).cast("long").alias("pos"),
        F.array_join(F.slice(w, 1, _PARA_W), " ").alias("p"),
    )
    paras = paras0.unionAll(extra)
    keyed = paras.select(
        "doc_id", "pos", "p",
        F.md5("p").alias("h"),
        (F.col("doc_id") * 100000 + F.col("pos")).alias("k"),
    )
    first = keyed.groupBy("h").agg(F.min("k").alias("kk"))
    kept = (
        keyed.join(first, "h")
        .filter(F.col("k") == F.col("kk"))
        .select("doc_id", "pos", "p")
    )
    sizes = paras.groupBy("doc_id").agg(F.count("*").alias("n_paras"))
    clean = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "p"))),
                lambda x: x["p"],
            ),
            "\n",
        ).alias("clean_text"),
    )
    return sizes.join(clean, "doc_id", "left").select(
        "doc_id",
        "n_paras",
        (F.col("n_paras") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


def build_session() -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("paragraph-shuffle-ab")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        # corpus-scale regime: the first-occurrence table must NOT
        # broadcast (it is paragraph-count-sized in production)
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
        "old_text_through_hash_join": paragraph_dedup_carry,
        "new_slim_shuffle (registered)": REGISTRY["paragraph_dedup"].fn,
    }
    chars = {}
    for label, fn in plans.items():
        before = shuffle_write_bytes(spark)
        row = (
            fn(spark, sf_dir)
            .agg(F.sum(F.length("clean_text")).alias("chars"))
            .collect()[0]
        )
        mb = (shuffle_write_bytes(spark) - before) / 1e6
        chars[label] = row["chars"]
        print(f"{label}: {mb:.2f} MB total shuffle, {row['chars']} clean chars")
    assert len(set(chars.values())) == 1, f"plans disagree: {chars}"
    print("outputs identical across plans")


if __name__ == "__main__":
    main()
