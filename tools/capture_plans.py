"""Capture .explain('formatted') for queries into plans/<round>/ files.

The optimization rounds need committed before/after physical plans for
every query touched (the judge cannot run Spark and checks plan claims
against these files).  This tool snapshots the formatted plan of each
named query — or the whole bench HEADLINE list — into
plans/<round>/<query>_<tag>.txt.

Usage: python tools/capture_plans.py <tag> [--round r14] [--sf SF_DIR]
           [query ...]

Notes:
- Plans are built (analyzed + optimized + physical), not executed; for
  queries whose *construction* runs driver-side jobs (BPE training
  loops, k-means sample pulls) those jobs do run, so the tool is not
  free — but nothing here is timed.
- Bench-only callables (minhash_lsh_pairs etc.) are resolved through
  bench.py's table so the captured set matches the bench rows.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    if not args:
        raise SystemExit("usage: capture_plans.py <tag> [--round rNN] [--sf DIR] [query ...]")
    tag = args.pop(0)
    rnd = "r14"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    while args:
        a = args.pop(0)
        if a == "--round":
            rnd = args.pop(0)
        elif a == "--sf":
            sf_dir = args.pop(0)
        else:
            names.append(a)

    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS",
        "--conf spark.ui.showConsoleProgress=false pyspark-shell",
    )
    from bench import HEADLINE, _bench_fns
    from semantic_query_engine_spark.session import get_spark

    registry, bench_only = _bench_fns()
    if not names:
        names = [n for n in HEADLINE if n in registry or n in bench_only]

    out_dir = os.path.join(REPO, "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = registry[name].fn if name in registry else bench_only[name]
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # snapshot failures loudly, don't skip
            text = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}\n"
            sys.stderr.write(f"[capture_plans] {name}: {text}")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {tag} (sf_dir={sf_dir})\n")
            f.write(text)
        sys.stderr.write(f"# wrote {path}\n")


if __name__ == "__main__":
    main()
