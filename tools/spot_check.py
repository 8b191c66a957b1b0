"""Round-seeded oracle spot-check over queries the driver never samples.

The driver's CORRECTNESS sample is STATIC (identical 50 names in r7 and
r8), so driver rows alone cannot detect a regression in the other ~139
registry queries round-over-round (VERDICT r8 "What's wrong" #4).  This
tool keeps fresh-name evidence flowing every round even when no judge
session runs: it picks N registry names pseudo-randomly from a
round-seeded hash — excluding the driver's static sample and the
round-8 judge batch — runs tools/check_oracle.py on them, and writes
the selection + results as SPOT_r{N}.json (committed per round).

Deterministic: the same round number (plus the same set of committed
SPOT_r*.json files) always selects the same names, so the artifact is
reproducible and auditable; different rounds rotate through different
slices of the registry.

Selection is least-recently-verified-first (VERDICT r9 #6): names never
covered by any committed SPOT_r*.json come first, then names whose last
spot pass is oldest, with the round-seeded hash breaking ties inside
each bucket.  At the default 40 names/round the ~140-name non-driver
pool gets full independent re-verification every ~3-4 rounds instead
of relying on hash luck.

Usage: python tools/spot_check.py ROUND [n] [sf_dir]
  e.g. python tools/spot_check.py 10         -> SPOT_r10.json, 40 names
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The 45 never-driver-sampled names the round-8 judge already re-ran
# independently (VERDICT r8) — excluded so spot rounds add NEW coverage.
JUDGE_R8 = [
    "merge_upsert", "snapshot_diff", "events_sessionize",
    "rollup_hourly_daily", "asof_join", "range_join",
    "timeseries_gapfill", "events_funnel", "events_retention",
    "events_ohlc", "applyinpandas_rank", "mapinpandas_tokens",
    "multimodal_decode", "pandas_udaf_mean", "rag_ask_flagship",
    "index_build", "embed_documents", "percentile_agg", "regexp_funcs",
    "null_handling", "window_range_frame", "correlated_scalar_subquery",
    "agg_grouping_sets", "pivot_status", "join_full_outer", "join_anti",
    "join_range_bands", "exists_subquery", "window_dist_funcs",
    "skew_salted_agg", "zorder_key", "variant_json", "hll_union_rollup",
    "xml_funcs", "fuzzy_match_join", "entity_resolution",
    "graph_pagerank", "bpe_learn_merges", "encoding_funcs",
    "stream_cdc_compact", "stream_python_source",
    "stream_index_maintenance", "semantic_mmr_rerank", "cache_evict_lfu",
    "embedding_centroids",
]


def driver_sample_names() -> set[str]:
    """UNION of names across every committed driver CORRECTNESS_r*.json.

    The newest file alone is not enough (VERDICT r10 evidence-gap a):
    the driver's per-round sample ROTATES (r10 picked 7 names absent
    from r9's file), so excluding only the latest sample let SPOT_r10
    overlap the driver's r10 batch.  Excluding everything the driver
    has EVER sampled keeps the committed SPOT artifact disjoint from
    any repeat pick; only a never-before-sampled driver name can still
    collide, which is exactly the residual rotation risk no ex-ante
    exclusion can remove."""
    names: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                names |= set(json.load(fh).keys())
        except (OSError, json.JSONDecodeError):
            continue
    return names


def new_since_last_gate() -> set[str]:
    """Registry names absent from the newest committed GATE_r*.json —
    i.e. operators ADDED this round.  The round-11 SPOT/driver overlap
    (VERDICT r11 #3) happened because the driver's sample rotates
    TOWARD new operators: SPOT ran first, then the driver's refreshed
    sample picked 3 of the same brand-new names.  New names are fully
    covered by this round's 100%-surface gate, so excluding them from
    the spot pool costs no coverage and removes the race ex ante."""
    from semantic_query_engine_spark.queries import REGISTRY

    gates = sorted(glob.glob(os.path.join(REPO, "GATE_r??.json")))
    if not gates:
        return set()
    try:
        with open(gates[-1]) as fh:
            payload = json.load(fh)
    except (OSError, json.JSONDecodeError):
        return set()
    records = payload.get("queries", payload)
    if not isinstance(records, dict):
        return set()
    return set(REGISTRY) - set(records)


def last_spot_rounds() -> dict[str, int]:
    """name -> newest round whose committed SPOT_r*.json covered it."""
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "SPOT_r*.json"))):
        m = re.search(r"SPOT_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                payload = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        # check_oracle --json nests per-query records under "queries";
        # the old top-level scan matched NOTHING (every committed SPOT
        # file has the nested shape), silently degrading the rotation
        # to pure seeded-hash order.  Found while applying ADVICE r10.
        records = payload.get("queries", payload)
        if not isinstance(records, dict):
            continue
        for name, res in records.items():
            # Only a PASSING record counts as "verified" (ADVICE r10):
            # a name that failed its spot check must stay at the front
            # of the least-recently-verified queue, not be deprioritized
            # for the next ~3-4 rounds by its own failure.
            if isinstance(res, dict) and (
                res.get("pass") is True or res.get("rows_match") is True
            ):
                last[name] = max(last.get(name, -1), rnd)
    return last


def pick(round_no: int, n: int) -> list[str]:
    from semantic_query_engine_spark.queries import REGISTRY

    excluded = driver_sample_names() | set(JUDGE_R8) | new_since_last_gate()
    pool = sorted(set(REGISTRY) - excluded)
    last = last_spot_rounds()

    def key(name: str):
        # least-recently-spot-verified first (never-verified = -1), the
        # seeded hash only ordering WITHIN an equally-stale bucket
        return (
            last.get(name, -1),
            hashlib.sha256(f"spot-r{round_no}:{name}".encode()).hexdigest(),
        )

    return sorted(sorted(pool, key=key)[:n])


def main() -> int:
    if len(sys.argv) < 2 or not re.fullmatch(r"\d+", sys.argv[1]):
        print(__doc__)
        return 2
    round_no = int(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    names = pick(round_no, n)
    out = os.path.join(REPO, f"SPOT_r{round_no:02d}.json")
    print(f"spot-checking {len(names)} never-sampled queries -> {out}")
    rc = subprocess.call(
        [sys.executable, os.path.join(REPO, "tools/check_oracle.py"),
         "--json", out, sf_dir, *names]
    )
    if os.path.exists(out):
        with open(out) as fh:
            payload = json.load(fh)
        payload["round"] = round_no
        payload["selection"] = {
            "seed": f"spot-r{round_no}",
            "policy": "least-recently-spot-verified first, seeded-hash "
                      "tiebreak (VERDICT r9 #6)",
            "excluded": "union of ALL committed CORRECTNESS_r*.json "
                        "samples + round-8 judge batch + operators new "
                        "since the last committed gate (VERDICT r11 #3)",
            "pool_excluded_count": len(
                driver_sample_names() | set(JUDGE_R8) | new_since_last_gate()
            ),
        }
        with open(out, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
