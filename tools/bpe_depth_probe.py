"""BPE production-depth probe (VERDICT r12 #6): what does one merge
round cost at depth 100, and where is the practical depth ceiling?

A 50k-merge production vocabulary is 50k sequential 1-row-collect
jobs; SCALE.md r12 showed each round's DATA cost is vocab-priced, but
two depth-dependent costs were unmeasured:

1. LINEAGE: the trainer chains one replace() select per round, so
   round r re-evaluates all r-1 prior merges and the analyzer walks an
   r-deep plan — per-round wall grows ~linearly, training O(n^2).
2. SCHEDULING FLOOR: each round is one Spark job (count agg + 1-row
   collect); at vocab-sized data the job launch itself bounds s/round.

This probe times depth-100 training round by round in both modes —
checkpoint_every=0 (the chained baseline) and checkpoint_every=16 (the
shipped default: localCheckpoint truncates the chain every 16 rounds)
— and prints per-round wall for early/mid/late windows plus the merge
tables' equality (lineage truncation must not move a single merge).

Usage: python tools/bpe_depth_probe.py [sf_dir] [depth]
  (defaults /root/testdata/sf0.1, 100)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from semantic_query_engine_spark.session import get_spark  # noqa: E402


def timed_learn(spark, sf_dir: str, depth: int, checkpoint_every: int):
    """_bpe_learn with a per-round stopwatch (same loop, instrumented
    via a thin copy of the loop driver would be drift-prone — instead
    time cumulative depth prefixes: rounds are sequential and
    deterministic, so wall(k) - wall(k-1) is round k's cost)."""
    from semantic_query_engine_spark.queries.textops import _bpe_learn

    t0 = time.time()
    base, cur, rows = _bpe_learn(
        spark, sf_dir, n_rounds=depth, checkpoint_every=checkpoint_every
    )
    total = time.time() - t0
    base.unpersist()
    return total, rows


def window_costs(spark, sf_dir: str, depth: int, checkpoint_every: int):
    """Per-round cost in three depth windows, each measured as a
    difference of two fresh full runs (depth d vs d-10), so no
    instrumentation perturbs the loop."""
    from semantic_query_engine_spark.queries.textops import _bpe_learn

    marks = {}
    for d in sorted({10, depth // 2 - 10, depth // 2, depth - 10, depth}):
        t0 = time.time()
        base, _, rows = _bpe_learn(
            spark, sf_dir, n_rounds=d, checkpoint_every=checkpoint_every
        )
        base.unpersist()
        marks[d] = (time.time() - t0, len(rows))
    return marks


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = get_spark("bpe-depth-probe")
    spark.sparkContext.setLogLevel("ERROR")

    merge_tables = {}
    for mode, ck in (("chained (checkpoint off)", 0), ("checkpointed/16", 16)):
        # warmup once (codegen javac for the pair-count plan)
        timed_learn(spark, sf_dir, 3, ck)
        marks = window_costs(spark, sf_dir, depth, ck)
        ds = sorted(marks)
        print(f"{mode}: total depth-{depth} = {marks[depth][0]:.1f}s "
              f"({marks[depth][1]} merges trained)")
        for lo, hi in zip(ds, ds[1:]):
            dt = marks[hi][0] - marks[lo][0]
            print(f"  rounds {lo+1}-{hi}: {dt / (hi - lo):.3f} s/round")
        _, rows = timed_learn(spark, sf_dir, depth, ck)
        merge_tables[mode] = rows
    a, b = merge_tables.values()
    assert a == b, "lineage truncation moved a merge!"
    print(f"merge tables identical across modes ({len(a)} rows)")


if __name__ == "__main__":
    main()
