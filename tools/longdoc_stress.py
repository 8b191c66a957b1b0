"""Long-document stress sweep for the token-explode operator family
(VERDICT r10 #5): every 10x scale point so far multiplied document
COUNT at a fixed ~100-word length, which is exactly the axis that hid
the span_corruption_masks array-carry defect (shuffle O(seeds x
doc_len) = quadratic in LENGTH, linear in count).  This sweep holds
corpus bytes constant and rebins them into 10x / 100x fewer-but-longer
documents, then measures wall time AND shuffle-written bytes for:

  - span_corruption_masks  (registered r11 plan: slim (doc_id, p)
    rows through the windows, ws joined back once per doc)
  - span_corruption_masks_carry (the PRE-r11 plan, replicated here
    verbatim and ONLY here, for the A/B the SCALE.md row needs: ws
    carried through the seed filter, both windows, and the group-by)
  - winnow_fingerprints
  - bigram_perplexity

Usage: python tools/longdoc_stress.py [src_sf_dir] [group ...]
Defaults: /root/testdata/sf0.1, groups 1 10 100.
Prints one JSON line per (operator, group) with wall seconds and
shuffle write MB, then a markdown table for SCALE.md.

Shuffle bytes come from the Spark UI REST API, so this tool builds its
OWN session with spark.ui.enabled=true (the shared builder disables
the UI); stage deltas are attributed by running one job at a time.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from semantic_query_engine_spark.scratch import scratch_path  # noqa: E402


def build_session() -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("longdoc-stress")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )


def rest(spark: SparkSession, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def shuffle_write_bytes(spark: SparkSession) -> int:
    """Total shuffle bytes written by all completed stages so far."""
    return sum(
        s.get("shuffleWriteBytes", 0)
        for s in rest(spark, "/stages?status=complete")
    )


def make_longdoc_dir(src: str, group: int) -> str:
    """Rebin the source documents into `group`-doc concatenations —
    same corpus bytes, group-x longer and group-x fewer documents."""
    dst = scratch_path(f"longdoc_g{group}")
    out = os.path.join(dst, "documents.parquet")
    if not os.path.exists(out):
        duckdb.connect().sql(f"""
        COPY (
          SELECT doc_id // {group} AS doc_id,
                 string_agg(text, ' ' ORDER BY doc_id) AS text,
                 min(lang) AS lang, 'longdoc' AS source,
                 CAST(sum(n_chars) + count(*) - 1 AS BIGINT) AS n_chars
          FROM read_parquet('{src}/documents.parquet')
          GROUP BY doc_id // {group}
        ) TO '{out}' (FORMAT PARQUET)
        """)
    return dst


def span_corruption_masks_carry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRE-r11 span_corruption_masks, verbatim: the full `ws` token
    array rides every surviving seed row through the two doc-keyed
    window exchanges and the group-by (F.max("ws") exists only to
    slice span_text).  Kept ONLY in this measurement tool as the A/B
    baseline for the SCALE.md long-doc row; the registered operator is
    the fixed plan in queries/mlpipeline_q.py."""
    from semantic_query_engine_spark.functions.text import words_of
    from semantic_query_engine_spark.queries.mlpipeline_q import _bucket_expr
    from semantic_query_engine_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id",
        F.transform(words_of(F.col("text")), lambda x: F.lower(x)).alias("ws"),
    )
    pos = w.select(
        "doc_id", "ws", F.explode(F.sequence(F.lit(1), F.size("ws"))).alias("p")
    ).select("doc_id", "ws", F.col("p").cast("long").alias("p"))
    starts = pos.filter(F.expr(_bucket_expr("doc_id || ':' || p", "instr", "STRING")) < 13)
    wlag = Window.partitionBy("doc_id").orderBy("p")
    merged = starts.withColumn(
        "is_head",
        F.when(F.lag("p").over(wlag) >= F.col("p") - 2, 0).otherwise(1),
    )
    wsum = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grp = merged.withColumn("span_id", F.sum("is_head").over(wsum))
    end = F.least(F.max("p") + 2, F.max(F.size("ws")).cast("long"))
    return grp.groupBy("doc_id", F.col("span_id").cast("int").alias("span_id")).agg(
        F.min("p").alias("span_start"),
        (end - F.min("p") + 1).cast("long").alias("span_len"),
        F.array_join(
            F.slice(F.max("ws"), F.min("p").cast("int"), (end - F.min("p") + 1).cast("int")),
            " ",
        ).alias("span_text"),
    )


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    groups = [int(a) for a in sys.argv[2:]] or [1, 10, 100]
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")

    from semantic_query_engine_spark.queries import REGISTRY

    ops = {
        "span_corruption_masks": REGISTRY["span_corruption_masks"].fn,
        "span_corruption_masks_carry": span_corruption_masks_carry,
        "winnow_fingerprints": REGISTRY["winnow_fingerprints"].fn,
        "bigram_perplexity": REGISTRY["bigram_perplexity"].fn,
        # r11 second wave: the rest of the token-explode family —
        # substring_dedup's per-position digests + TWO window families
        # (digest-partitioned cross-doc test, doc-partitioned coverage
        # LEAD) are the most length-exposed plan in the repo
        "substring_dedup": REGISTRY["substring_dedup"].fn,
        "vocab_coverage": REGISTRY["vocab_coverage"].fn,
        "bpe_encode_fertility": REGISTRY["bpe_encode_fertility"].fn,
    }
    results: dict[str, dict[int, dict]] = {k: {} for k in ops}
    for group in groups:
        d = make_longdoc_dir(src, group)
        for name, fn in ops.items():
            df = fn(spark, d)
            before = shuffle_write_bytes(spark)
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            wall = time.monotonic() - t0
            mb = (shuffle_write_bytes(spark) - before) / 1e6
            rec = {"wall_s": round(wall, 2), "shuffle_write_mb": round(mb, 1)}
            results[name][group] = rec
            print(json.dumps({"op": name, "group": group, **rec}), flush=True)

    print("\n| Operator | metric | " + " | ".join(f"{g}x len" for g in groups) + " |")
    print("|---|---|" + "---|" * len(groups))
    for name, per in results.items():
        for metric in ("wall_s", "shuffle_write_mb"):
            row = " | ".join(str(per[g][metric]) for g in groups)
            print(f"| `{name}` | {metric} | {row} |")


if __name__ == "__main__":
    main()
