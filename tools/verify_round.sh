#!/usr/bin/env bash
# One-command per-round evidence regeneration (VERDICT r8 #2/#5):
#
#   tools/verify_round.sh <ROUND> [sf_dir]
#
# runs, in order, at the current HEAD:
#   1. the full-surface oracle gate     -> GATE_r{N}.json   (must be N/N)
#   2. the physical-plan red-flag sweep -> PLAN_AUDIT.md    (0 hard flags,
#      header stamped with the HEAD commit + dirty marker)
#   3. the accuracy-gate revalidator    (every hardcoded-TRUE oracle gate
#      recomputed on the Spark side; must report "all N gates hold")
#   4. the round-seeded spot check      -> SPOT_r{N}.json   (fresh names
#      the driver's static CORRECTNESS sample never covers)
#
# Commit GATE_r{N}.json, PLAN_AUDIT.md and SPOT_r{N}.json with the round.
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:?usage: tools/verify_round.sh ROUND [sf_dir]}"
SF_DIR="${2:-/root/testdata/sf0.01}"
PADDED=$(printf "%02d" "$ROUND")

python tools/check_oracle.py --json "GATE_r${PADDED}.json" "$SF_DIR"
python tools/plan_audit.py --markdown > PLAN_AUDIT.md
head -3 PLAN_AUDIT.md
python tools/revalidate_gates.py "$SF_DIR"
python tools/spot_check.py "$ROUND" 25 "$SF_DIR"
echo "verify_round: all four artifacts regenerated at $(git rev-parse --short HEAD)"
