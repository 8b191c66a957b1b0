"""Distributed exclusive prefix sums — the building block that turns a
per-shard running total into an exact GLOBAL running total without an
unpartitioned window over the full data (the round-1 WindowExec
offender) and without the O(S²) triangle join over the shard-totals
frame.

Size-adaptive shape:

- Frames of up to `width²` rows (16,384 at the default width) are
  closed with ONE window pass: a window partition of ≤ width² totals
  rows is trivial on any executor, and a shard-totals frame is already
  S rows for S shards, so this covers every workload below ~16k shards
  with a single count action and a single window stage.  (The round-4
  implementation recursed at `width` rows and paid a `count()` action
  PER LEVEL plus a triangle-join base case — pure job-count overhead at
  fixture scale, the training_data_prep bench regression.)
- Larger frames recurse: group keys into super-shards of `width`;
  within each super-shard the exclusive cumsum is a bounded window
  (≤ width rows per partition); super-shard totals recurse with the
  same construction.  Depth = log_width(S) minus the two levels the
  base case absorbs: 200M shards at width 128 is one recursive level
  before the width² base case.  Each level is one bounded-window
  shuffle over a frame that shrinks width×, plus one tiny count
  action — at that scale the count is noise; at fixture scale the
  recursion never triggers.

Used by pack_sequences / training_data_prep (queries/mlpipeline_q.py),
whose round-2/3 implementation joined the totals frame against itself —
quadratic in shard count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exclusive_prefix_sum(
    df: DataFrame,
    key: str,
    val: str,
    part_cols: tuple[str, ...] = (),
    width: int = 128,
    out_col: str = "offset",
) -> DataFrame:
    """(part_cols..., key, out_col): for each row, the sum of `val`
    over all rows with a smaller `key` (within the same part_cols
    group).  `key` must be numeric and unique per group; order follows
    numeric key order.  Exact — no sampling, no approximation."""
    n = df.count()  # ONE action on the width²-or-smaller path
    if n <= width * width:
        # Base case: one exclusive-cumsum window.  Worst case a single
        # partition holds all n ≤ width² rows — 16k tiny totals rows in
        # one window partition is cheap at any cluster size, and this
        # path is the whole story for every frame below ~16k groups.
        parts = list(part_cols) if part_cols else [F.lit(1)]
        w = (
            Window.partitionBy(*parts)
            .orderBy(key)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return df.select(
            *part_cols,
            key,
            F.coalesce(F.sum(val).over(w), F.lit(0)).cast("long").alias(out_col),
        )
    sup = f"{key}__sup"  # level-unique: recursion appends another __sup
    d = df.withColumn(sup, F.floor(F.col(key) / F.lit(width)))
    w = (
        Window.partitionBy(*part_cols, sup)
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = d.withColumn(
        "__within", F.coalesce(F.sum(val).over(w), F.lit(0)).cast("long")
    )
    sup_totals = d.groupBy(*part_cols, sup).agg(
        F.sum(val).cast("long").alias(f"{sup}_total")
    )
    sup_offs = exclusive_prefix_sum(
        sup_totals,
        sup,
        f"{sup}_total",
        part_cols=part_cols,
        width=width,
        out_col=f"{sup}_off",
    )
    return within.join(sup_offs, [*part_cols, sup]).select(
        *part_cols,
        key,
        (F.col("__within") + F.col(f"{sup}_off")).cast("long").alias(out_col),
    )
