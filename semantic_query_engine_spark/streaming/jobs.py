"""Structured Streaming jobs over the events fixture (SURVEY §2 Part B
streaming row; the reference's streaming surface is token streaming A19
and per-chat state A21, /root/reference/app/main.py:616-647,484-489).

Pattern: `readStream` file source -> transformations -> memory sink with
`trigger(availableNow=True)`; the driver-declared queries run the REAL
streaming engine (micro-batch planner, state store, watermarks) and then
return the materialized result as a batch DataFrame, so tumbling-window
aggregates stay oracle-checkable.

At production scale the same plans run against Kafka/file streams with
`foreachBatch` parquet sinks; nothing here assumes the memory sink.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a streaming source.  Schema comes from a batch
    read (streaming file sources need explicit schemas).  Old NANOS-typed
    fixtures arrive as bigint (nanosAsLong) and get floor-divided to
    micros; MICROS-typed fixtures already read as timestamps and pass
    through — same guard as the batch loader."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, "events.parquet")
    batch = spark.read.parquet(path)
    ts_dtype = dict(batch.dtypes).get("ts")
    # the file-stream source wants a directory: stream the sf_dir with a
    # filename glob so only events.parquet is picked up
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if ts_dtype == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif ts_dtype == "timestamp_ntz":
        # watermarks require TIMESTAMP; UTC session tz makes this cast a
        # pure re-tag (see sources/fixtures.py)
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


# (session object id, sink name) pairs: memory-sink temp views are
# SESSION-scoped, so dropping must be bookkept per session — popping
# another session's name would silently no-op the dropTempView there
# and leak that sink for its session's lifetime.
_LIVE_SINKS: list[tuple[int, str]] = []


def drop_live_sinks(spark: SparkSession) -> None:
    """Drop any memory-sink table still registered FOR THIS SESSION (see
    run_to_memory's one-live-sink contract).  Call after consuming a
    streaming query's result when the session will keep doing other
    work — a live sink pins its full result in memory."""
    sid = id(spark)
    remaining = []
    for entry_sid, name in _LIVE_SINKS:
        if entry_sid != sid:
            remaining.append((entry_sid, name))
            continue
        try:
            spark.catalog.dropTempView(name)
        except Exception:  # noqa: BLE001
            pass
    _LIVE_SINKS[:] = remaining


def run_to_memory(
    streaming_df: DataFrame,
    output_mode: str = "complete",
) -> DataFrame:
    """Execute a streaming aggregation to completion (availableNow) into
    an in-memory table; return it as a batch DataFrame.

    One live sink per session: earlier runs' memory tables are dropped
    on the next call — a leaked sink pins its entire result in executor
    memory for the session's lifetime (measured ~1.2s of drag on
    unrelated queries after three streaming runs at sf0.1).  The
    returned DataFrame is therefore valid until the NEXT run_to_memory
    call; materialize it before starting another streaming query."""
    drop_live_sinks(streaming_df.sparkSession)
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _LIVE_SINKS.append((id(streaming_df.sparkSession), name))
    return streaming_df.sparkSession.table(name)
