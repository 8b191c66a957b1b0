"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) for
the reference's raw corpus layout: a directory of `PMC*.txt` files
(/root/reference/app/main.py:427-438 — listdir, prefix/suffix filter,
utf-8 with latin-1 fallback).

`spark.read.text(wholetext=True)` already covers the simple case
(sources/text_corpus.py); this source exists for the part built-ins
can't express: the reference's exact filename contract and decode
fallback, surfaced as a first-class `spark.read.format("pmc_corpus")`
with one input partition PER FILE so a 3,027-file corpus reads with
full task parallelism.  At 100 TB the same class pattern wraps any
external system (object store listing, REST pagination) — the planner
sees ordinary partitions and schedules them like parquet splits.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("text", StringType(), True),
    ]
)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class CorpusReader(DataSourceReader):
    def __init__(self, options: dict):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("pmc_corpus requires .option('path', <dir>)")

    def partitions(self):
        names = sorted(
            n
            for n in os.listdir(self.dir)
            if n.startswith("PMC") and n.endswith(".txt")
        )
        return [_FilePartition(os.path.join(self.dir, n)) for n in names]

    def read(self, partition: _FilePartition):
        # utf-8 first, latin-1 fallback — the reference's decode ladder
        try:
            with open(partition.path, encoding="utf-8") as f:
                text = f.read()
        except UnicodeDecodeError:
            with open(partition.path, encoding="latin-1") as f:
                text = f.read()
        doc_id = os.path.splitext(os.path.basename(partition.path))[0]
        yield (doc_id, text)


class CorpusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pmc_corpus"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> CorpusReader:
        return CorpusReader(self.options)


def register_corpus_source(spark) -> None:
    spark.dataSource.register(CorpusDataSource)
