"""Data-layout maintenance: small-files compaction.

The operational counterpart of the Z-order key in queries/scale_q.py —
streaming sinks and over-parallel writers leave thousands of KB-sized
objects per partition, and at 100 TB the resulting footer/open costs
dominate scans.  Compaction rewrites a directory to ~target-sized files
with a NARROW coalesce (no shuffle: compaction moves bytes, it must not
also pay a cluster-wide repartition unless re-sorting is requested).
"""

from __future__ import annotations

import glob
import math
import os

from pyspark.sql import SparkSession


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_mb: int = 128,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite `src_dir`'s parquet files into ~`target_mb` files at
    `dst_dir`; returns the output file count.

    - Default path: `coalesce(n)` — narrow, shuffle-free; each output
      task concatenates whole input splits.
    - `sort_by` set (e.g. a Z-order key's columns): `repartitionByRange`
      + local sort — pays ONE shuffle to also fix ordering/min-max
      layout while compacting, the OPTIMIZE ... ZORDER BY composition.

    Sizing reads the actual source byte count from the filesystem (a
    driver-side listing — the same thing the scan planner does), not a
    row-count guess, so compressed width is respected."""
    total_bytes = sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(src_dir, "*.parquet"))
    )
    n_out = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(src_dir)
    if sort_by:
        df = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(*sort_by)
    else:
        df = df.coalesce(n_out)
    df.write.mode("overwrite").parquet(dst_dir)
    return len(glob.glob(os.path.join(dst_dir, "*.parquet")))
