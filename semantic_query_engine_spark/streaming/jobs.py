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
    read (streaming file sources need explicit schemas); the NANOS
    timestamp is carried as long and floor-divided to micros, exactly as
    the batch loader does."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # the file-stream source wants a directory: stream the sf_dir with a
    # filename glob so only events.parquet is picked up
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def run_to_memory(
    streaming_df: DataFrame,
    output_mode: str = "complete",
) -> DataFrame:
    """Execute a streaming aggregation to completion (availableNow) into
    an in-memory table; return it as a batch DataFrame."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = streaming_df.sparkSession
    return spark.table(name)
