"""Distributed exclusive prefix sums — the building block that turns a
per-shard running total into an exact GLOBAL running total without an
unpartitioned window (the round-1 WindowExec offender) and without the
O(S²) triangle join over the shard-totals frame.

Shape: group keys into super-shards of `width`; within each
super-shard the exclusive cumsum is a BOUNDED window (≤ width rows per
partition); super-shard totals recurse with the same construction
until one level fits `width`, where a triangle join (≤ width² pairs)
closes the recursion.  Depth = log_width(S): 200M shards at width 128
is 3 levels — each level one bounded-window shuffle over a frame that
shrinks by width×.  Used by pack_sequences / training_data_prep
(queries/mlpipeline_q.py), whose round-2/3 implementation joined the
totals frame against itself — quadratic in shard count.
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
    n = df.count()  # tiny action per level; the frame shrinks width× each
    if n <= width:
        # base case: bounded triangle join, ≤ width² pairs
        left = df.select(
            *[F.col(c).alias(f"__p_{c}") for c in part_cols],
            F.col(key).alias("__k"),
        )
        cond = F.col(key) < F.col("__k")
        for c in part_cols:
            cond = cond & (F.col(c) == F.col(f"__p_{c}"))
        return (
            left.join(df, cond, "left")
            .groupBy(*[f"__p_{c}" for c in part_cols], "__k")
            .agg(F.coalesce(F.sum(val), F.lit(0)).cast("long").alias(out_col))
            .select(
                *[F.col(f"__p_{c}").alias(c) for c in part_cols],
                F.col("__k").alias(key),
                out_col,
            )
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
