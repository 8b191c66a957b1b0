#!/usr/bin/env bash
# One-command per-round evidence regeneration (VERDICT r8 #2/#5):
#
#   tools/verify_round.sh <ROUND> [sf_dir] [--bench]
#
# runs, in order, at the current HEAD:
#   1. the full-surface oracle gate     -> GATE_r{N}.json   (must be N/N)
#      plus the same gate at sf0.1      -> GATE_r{N}_sf0.1.json (boundary
#      flips are data-dependent; see round-11 catches)
#   2. the physical-plan red-flag sweep -> PLAN_AUDIT.md    (0 hard flags,
#      header stamped with the HEAD commit + dirty marker)
#   3. the accuracy-gate revalidator    (every hardcoded-TRUE oracle gate
#      recomputed on the Spark side; must report "all N gates hold")
#   4. the round-seeded spot check      -> SPOT_r{N}.json   (40 fresh
#      names, least-recently-verified first — the driver's static
#      CORRECTNESS sample never rotates)
#   5. with --bench: the full bench     -> BENCH_local_r{N}.json (runs
#      LAST so the gate/spot JVMs can't inflate its timings; the JSON
#      carries loadavg + foreign-JVM stamps so a loaded run
#      self-identifies — VERDICT r9 #1/#8)
#
# Commit GATE_r{N}.json, PLAN_AUDIT.md and SPOT_r{N}.json with the round.
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:?usage: tools/verify_round.sh ROUND [sf_dir] [--bench]}"
shift
SF_DIR="/root/testdata/sf0.01"
RUN_BENCH=0
for arg in "$@"; do
    if [[ "$arg" == "--bench" ]]; then RUN_BENCH=1; else SF_DIR="$arg"; fi
done
PADDED=$(printf "%02d" "$ROUND")

# clear leftovers from SIGKILLed processes (scratch.py cleans on normal
# exit; this is the backstop the fixed per-repo location exists for).
# Dead pids only (ADVICE r10): a concurrent live gate/bench run's
# layouts must never be yanked mid-read.  Dir names are <pid>-<boot
# starttime>; liveness is keyed by the pid component.
if [[ -d .scratch ]]; then
    for d in .scratch/*/; do
        [[ -e "$d" ]] || continue
        pid="$(basename "$d")"; pid="${pid%%-*}"
        # non-numeric "pid" = not a per-process dir (e.g. the shared
        # constant-path JSONL corpus) — never sweep those (ADVICE r11:
        # kill -0 shared fails and a concurrent live gate gets its
        # corpus yanked mid-read)
        [[ "$pid" =~ ^[0-9]+$ ]] || continue
        kill -0 "$pid" 2>/dev/null || rm -rf "$d"
    done
fi

python tools/check_oracle.py --json "GATE_r${PADDED}.json" "$SF_DIR"
# Second full gate at sf0.1 (10x the driver's comparison SF): 1-ulp
# rounding boundaries are data-dependent — round 11's sf0.1 run caught
# two flips (bigram_perplexity's half-micro mean, multimodal_features'
# stale float-floor oracle) that sf0.01 had never hit.  ~6 min.
python tools/check_oracle.py --json "GATE_r${PADDED}_sf0.1.json" /root/testdata/sf0.1
# Third gate (VERDICT r11 #7): the dedup/curation family at sf1 on the
# replica fixtures — summation-order / grouping boundary classes only
# show at bigger groups (the sf0.1 gate caught two 1-ulp flips in r11;
# sf1 is the next rung).  Family-scoped to keep the round affordable.
if [[ -d .scale_data/sf1 ]]; then
    # r14 (VERDICT r13 #4): the sf1 rung now runs the FULL registry —
    # the module scoping (r12: dedup/curation/multimodal; r13: ~104
    # names) existed to keep rounds affordable, but summation-order /
    # grouping-boundary classes in the relational/events/scalars/
    # streaming suites only show at bigger groups too, and the full
    # run measured ~25 min — affordable once per round
    python tools/check_oracle.py \
        --json "GATE_r${PADDED}_sf1_subset.json" .scale_data/sf1
else
    echo "verify_round: .scale_data/sf1 missing — skipping sf1 family gate" >&2
fi
python tools/plan_audit.py --markdown > PLAN_AUDIT.md
head -3 PLAN_AUDIT.md
python tools/revalidate_gates.py "$SF_DIR"
python tools/spot_check.py "$ROUND" 40 "$SF_DIR"
echo "verify_round: all four artifacts regenerated at $(git rev-parse --short HEAD)"

if [[ "$RUN_BENCH" == "1" ]]; then
    echo "verify_round: running bench (quiet-machine check is stamped into the JSON)"
    python bench.py | tail -1 | tee "BENCH_local_r${PADDED}.json"
fi
