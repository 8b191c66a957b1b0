"""Physical-plan audit: print .explain('formatted') for selected queries
and flag the markers that matter at scale — parquet filter pushdown,
column-pruned ReadSchema, broadcast joins where a side is small,
TakeOrderedAndProject for top-k, WholeStageCodegen coverage.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from semantic_query_engine_spark.queries import REGISTRY  # noqa: E402
from semantic_query_engine_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "semantic_topk",
    "knn_join",
    "doc_chunk",
    "q1_pricing_summary",
    "join_inner_q3",
    "join_q5_region",
    "window_topk_per_group",
    "dedup_jaccard",
    "events_sessionize",
]

MARKERS = [
    "PushedFilters: [IsNotNull",
    "BroadcastHashJoin",
    "TakeOrderedAndProject",
    "WholeStageCodegen",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT
    spark = get_spark("explain-audit")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        found = [m for m in MARKERS if m in plan]
        print(f"\n{'='*70}\n{name}: markers={found}\n{'='*70}")
        print(plan)


if __name__ == "__main__":
    main()
