"""Plan-lineage truncation, in ONE place (ADVICE r14).

The engine truncates shared subtrees with `localCheckpoint` in ~60
places (the tokenize-once / shared-table / fixpoint classes, guide
§1.2/§3.3: materialise an intermediate to stop Catalyst re-expanding a
non-cheap subtree once per consumer).  `localCheckpoint` blocks are
EXECUTOR-LOCAL: cheap (no reliable storage round-trip), but lost if an
executor is decommissioned — acceptable on local[*] and on clusters
without aggressive preemption, where a lost block just fails the job
and a retry recomputes.  A deployment that needs the truncated
intermediates to survive executor loss (spot instances, dynamic
de-allocation) sets SPARK_GRAFT_TRUNCATE=reliable to route every site
through `checkpoint()` instead (requires
`spark.sparkContext.setCheckpointDir(...)` at session setup — the
standard reliable-checkpoint contract), without auditing call sites.

Use as `df.transform(truncate_plan)` / `df.transform(truncate_eager)`
so call chains read exactly like the `.localCheckpoint(...)` they
replace.  `truncate_plan` is LAZY: it only cuts lineage/analysis cost,
materialising on first use — the right default for the shared-subtree
class.  `truncate_eager` materialises NOW — required by the fixpoint
loops (connected components, BPE rounds, incremental-cache merges)
whose driver logic depends on the previous round being computed before
the next plan is built.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def truncate_plan(df: DataFrame, eager: bool = False) -> DataFrame:
    """Truncate `df`'s lineage (lazy by default; see module docstring)."""
    if os.environ.get("SPARK_GRAFT_TRUNCATE", "local") == "reliable":
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def truncate_eager(df: DataFrame) -> DataFrame:
    """Truncate and materialise NOW (fixpoint-loop sites)."""
    return truncate_plan(df, eager=True)
