"""Events-loader robustness across parquet timestamp physical types —
the round-3 incident class: the driver regenerated events.parquet as
TIMESTAMP(MICROS) and an unconditional nanos->micros conversion threw
on every events query.  The loader must normalize ts to TIMESTAMP
(session-UTC) whatever the file says."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from semantic_query_engine_spark.sources.fixtures import load_table

_ROWS = [
    (1, datetime.datetime(2024, 1, 1, 0, 0, 0), 7, "signup", 1.5, "{}"),
    (2, datetime.datetime(2024, 1, 1, 0, 30, 0), 7, "purchase", 2.5, "{}"),
]


def _write_events(dirpath, ts_unit: str) -> str:
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
            "ts": pa.array([r[1] for r in _ROWS], pa.timestamp(ts_unit)),
            "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in _ROWS]),
            "value": pa.array([r[4] for r in _ROWS], pa.float64()),
            "props": pa.array([r[5] for r in _ROWS]),
        }
    )
    pq.write_table(tbl, f"{dirpath}/events.parquet")
    return str(dirpath)


@pytest.mark.parametrize("ts_unit", ["ns", "us", "ms"])
def test_load_events_normalizes_ts_across_physical_types(
    spark, tmp_path, ts_unit
):
    sf_dir = _write_events(tmp_path, ts_unit)
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(
        (r.event_id, r.ts.strftime("%Y-%m-%d %H:%M:%S")) for r in df.collect()
    )
    assert got == [
        (1, "2024-01-01 00:00:00"),
        (2, "2024-01-01 00:30:00"),
    ]


def test_plan_cache_invalidates_on_file_regeneration(spark, tmp_path):
    """Regenerating a fixture at the same path within one session (the
    round-3 incident class) must evict the cached plan — including a
    physical-type change from NANOS to MICROS."""
    import os
    import time

    sf_dir = _write_events(tmp_path, "ns")
    first = load_table(spark, sf_dir, "events")
    assert first.count() == 2
    assert load_table(spark, sf_dir, "events") is first  # cache hit

    time.sleep(0.02)  # ensure a distinct mtime_ns even on coarse clocks
    tbl = pa.table(
        {
            "event_id": pa.array([9], pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2025, 6, 1, 12, 0, 0)], pa.timestamp("us")
            ),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["click"]),
            "value": pa.array([0.5], pa.float64()),
            "props": pa.array(["{}"]),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "events.parquet"))
    fresh = load_table(spark, sf_dir, "events")
    assert fresh is not first
    rows = fresh.collect()
    assert [r.event_id for r in rows] == [9]
    assert dict(fresh.dtypes)["ts"] == "timestamp"
