"""SparkSession builder tuned for the local[32] test harness while staying
cluster-correct: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), Arrow on (Pandas-UDF fast path), shuffle partitions sized to
the local core count instead of the 200 default.  On a real cluster the
same builder works — only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "semantic-query-engine-spark") -> SparkSession:
    """Return the active session if one exists (the driver harness owns its
    own session), else build a local one sized from SPARK_GRAFT_CPUS."""
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # 174 registered plans (plus AQE re-plans) overflow the default
        # 100-entry generated-class cache, forcing re-javac of large
        # whole-stage-codegen classes (the 1024-dim vector plans compile
        # in seconds, not millis) on every eviction round-trip
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    return spark
