"""Harness-only Spark session utilities shared by bench.py and
tools/scale_run.py.  Deliberately OUTSIDE the library package: these
helpers mutate global JVM state in ways library code must never do
(ADVICE r5 — release_persistent_rdds unpersists EVERY pinned RDD,
including caches owned by api.py's SearchIndex and localCheckpoint
blocks backing DataFrames a caller still holds, which are not
recomputable)."""

from __future__ import annotations

from pyspark.sql import SparkSession


def release_persistent_rdds(spark: SparkSession) -> int:
    """Unpersist every RDD still pinned in the block manager and return
    how many were released.  HARNESS-ONLY between timed queries: several
    operators localCheckpoint intermediates (dedup CC, PageRank, the
    prep pipelines) and those blocks accumulate for the session's
    lifetime — measured to slow later queries in a long session up to
    4-9x once storage squeezes execution memory.  Unpersisting a
    localCheckpoint makes ITS DataFrame unusable (checkpoint blocks are
    not recomputable), and a library .cache() (e.g. api.SearchIndex)
    is silently dropped — so call this only between queries whose
    results have been fully consumed, never from library code."""
    sc = spark.sparkContext._jsc.sc()
    rdds = sc.getPersistentRDDs().toList()
    it = rdds.iterator()
    n = 0
    while it.hasNext():
        it.next()._2().unpersist(True)
        n += 1
    return n
