#!/usr/bin/env bash
# Commit the driver-written round artifacts that refresh at round end
# (BENCH_r{N}.json / CORRECTNESS_r{N}.json land untracked; LEAKCHECK and
# the bench/stream result copies land modified). Five consecutive
# rounds carried these uncommitted into the next round's start — run
# this once at round start (or end) so the round record is durable.
#
# Usage: scripts/commit_round_artifacts.sh [round-number]
# With no argument, stages every matching artifact present.
set -euo pipefail
cd "$(dirname "$0")/.."

round="${1:-}"
sfx="${round:+_r${round}}"

paths=()
for f in BENCH${sfx:-_r*}.json CORRECTNESS${sfx:-_r*}.json \
         bench_results${sfx:-_r*}.json stream_bench${sfx:-_r*}.json \
         LEAKCHECK.json VERDICT.md ADVICE.md; do
  # COPYCHECK.json is deliberately absent: it is gitignored
  # shellcheck disable=SC2206 # glob expansion is the point
  for g in $f; do [ -e "$g" ] && paths+=("$g"); done
done

if [ ${#paths[@]} -eq 0 ]; then
  echo "no round artifacts found" >&2
  exit 0
fi

git add -- "${paths[@]}"
if git diff --cached --quiet -- "${paths[@]}"; then
  echo "round artifacts already committed" >&2
  exit 0
fi

# pathspec-scoped commit: anything ELSE the user had staged stays
# staged and is NOT swept into the artifact commit
git commit -m "round${round:+ ${round}}: driver artifacts (bench/correctness/leakcheck)" \
  -- "${paths[@]}"
