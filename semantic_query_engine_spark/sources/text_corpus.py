"""Raw text-corpus source — the Spark-native analog of the reference's
startup directory scan (SURVEY A3, /root/reference/app/main.py:427-438:
os.listdir, keep PMC*.txt, read whole file, utf-8 with latin-1
fallback).

Spark-first shape: `spark.read.text(dir, wholetext=True)` gives one row
per file in one distributed scan (no driver-side listdir loop);
`input_file_name()` carries the filename; the PMC*.txt filter is a
plan-level predicate.  Charset fallback: Spark's text source decodes
UTF-8 with replacement instead of raising, so the latin-1 fallback
branch collapses into lossless-or-replaced decoding — same
never-fail contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_corpus(
    spark: SparkSession,
    corpus_dir: str,
    prefix: str = "PMC",
    suffix: str = ".txt",
) -> DataFrame:
    """(doc_id, text) — doc_id is the bare filename stem, matching the
    reference's use of the filename as doc_id (app/main.py:446-449)."""
    raw = spark.read.text(f"{corpus_dir}/*{suffix}", wholetext=True).select(
        F.input_file_name().alias("path"), F.col("value").alias("text")
    )
    fname = F.element_at(F.split(F.col("path"), "/"), -1)
    return (
        raw.withColumn("fname", fname)
        .filter(F.col("fname").startswith(prefix) & F.col("fname").endswith(suffix))
        .select(
            F.regexp_replace("fname", f"{suffix}$", "").alias("doc_id"),
            "text",
        )
    )
