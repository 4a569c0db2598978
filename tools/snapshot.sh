#!/usr/bin/env bash
# Round-snapshot gate: stage every round artifact the driver/judge
# produces and fail loudly if the tree is still dirty afterwards.
# Rounds 6-9 each left BENCH_r*/CORRECTNESS_r* untracked; this makes
# "commit the round artifacts" one command with a mechanical check.
#
# Usage: tools/snapshot.sh [commit message]
#   - stages BENCH_r*.json CORRECTNESS_r*.json LEAKCHECK.json
#     COPYCHECK.json VERDICT.md ADVICE.md bench_full_last.json
#     PROGRESS.jsonl (whichever exist)
#   - commits them with the given message (default: "round snapshot")
#   - exits 1 if `git status` is not clean afterwards, listing what
#     was left behind
set -euo pipefail
cd "$(dirname "$0")/.."

msg="${1:-round snapshot: bench/correctness/judge artifacts}"

# per-query bench history (r15 VERDICT task 4): bench_full_last.json
# (201 per-query mins + jobs + spreads; sums to min_sum) is gitignored
# as driver churn, so cross-round per-query regression detection needs
# a round-stamped copy. Stamp it with the highest BENCH_r{N} present —
# the round whose bench produced it.
if [ -e bench_full_last.json ]; then
  round=$(ls BENCH_r*.json 2>/dev/null \
    | sed -E 's/BENCH_r0*([0-9]+)\.json/\1/' | sort -n | tail -1)
  if [ -n "${round:-}" ]; then
    cp bench_full_last.json "bench_full_r$(printf '%02d' "$round").json"
  fi
fi

artifacts=()
for f in BENCH_r*.json CORRECTNESS_r*.json LEAKCHECK.json COPYCHECK.json \
         VERDICT.md ADVICE.md bench_full_last.json bench_full_r*.json \
         PROGRESS.jsonl; do
  # skip driver-churn files .gitignore excludes on purpose (git add on
  # an ignored path errors, which set -e turns into an abort); the if
  # form also avoids the &&-list set-e hazard on a false condition
  if [ -e "$f" ] && ! git check-ignore -q "$f"; then
    artifacts+=("$f")
  fi
done

if [ "${#artifacts[@]}" -gt 0 ]; then
  git add -- "${artifacts[@]}"
fi

if ! git diff --cached --quiet; then
  git commit -m "$msg"
fi

if [ -n "$(git status --porcelain)" ]; then
  echo "snapshot: tree still dirty after artifact commit:" >&2
  git status --porcelain >&2
  exit 1
fi
echo "snapshot: clean"
