#!/usr/bin/env bash
# Round-close freeze: pin the driver-written artifacts for round N so
# the next round's judge sees a committed snapshot instead of untracked
# files (the recurring snapshot-timing item from the r12/r13 verdicts).
#
#   tools/freeze_round.sh 14
#
# Idempotent: re-running overwrites the same frozen copies. Commit the
# result yourself (the script stages, never commits).
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:?usage: tools/freeze_round.sh <round-number>}"
RN=$(printf "r%02d" "$N")
ADDED=()
for f in "BENCH_r${N}.json" "CORRECTNESS_r${N}.json" LEAKCHECK.json COPYCHECK.json; do
  [ -f "$f" ] && { git add "$f"; ADDED+=("$f"); }
done
if [ -f docs/bench_driver_latest.json ]; then
  cp docs/bench_driver_latest.json "docs/bench_r${N}_driver.json"
  git add docs/bench_driver_latest.json "docs/bench_r${N}_driver.json"
  ADDED+=("docs/bench_r${N}_driver.json")
fi
echo "staged: ${ADDED[*]:-nothing} (round ${RN})"
git status --short
