#!/bin/sh
# Stage and commit the driver-emitted round artifacts (BENCH_r*.json,
# CORRECTNESS_r*.json, BENCH_DETAIL.json, LEAKCHECK.json, COPYCHECK.json,
# VERDICT.md, ADVICE.md) so they land tracked instead of drifting as
# untracked files between rounds. Safe to run when nothing changed.
cd "$(dirname "$0")/.." || exit 1
git add BENCH_r*.json CORRECTNESS_r*.json CORRECTNESS_10x.json \
  CORRECTNESS_100x.json CORRECTNESS_1000x.json \
  BENCH_DETAIL.json LEAKCHECK.json COPYCHECK.json VERDICT.md ADVICE.md \
  2>/dev/null
git diff --cached --quiet || git commit -m "track round artifacts (bench/correctness/leakcheck)"
