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
    builder = (
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
    )
    # Streaming state-store provider.  The default (HDFSBackedStateStore)
    # materializes every key on the JVM heap per version — fine for the
    # small-state test SFs, a heap bomb at production state sizes.
    # SPARK_GRAFT_STATE_STORE=rocksdb switches to the bundled RocksDB
    # provider (off-heap, incremental snapshots) — measured on
    # stream_dedup with ~10M dedup keys (20M doubled events, sf10):
    # 68 s vs 116 s default, 1.7x; at sf0.1's tiny state it *costs*
    # ~0.7 s of native-store overhead, hence opt-in here and the
    # recommended default on a real cluster (see SCALE.md).
    if os.environ.get("SPARK_GRAFT_STATE_STORE", "").lower() == "rocksdb":
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
