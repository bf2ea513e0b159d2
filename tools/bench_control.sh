#!/usr/bin/env bash
# Same-session paired bench: the previous round's code and HEAD, built and
# run back-to-back on one host, so regression claims don't rest on
# cross-session VM variance (BASELINE.md's round-1 caveat: the shared host
# has multi-second I/O stalls and ~10% session-to-session drift).
#
# Usage: tools/bench_control.sh <prev-ref> [sfDir] [passes]
# Emits BENCH_control.json at the repo root: both totals, per-query times,
# and common-query ratios (head/prev) with the median.
#
# NEVER run anything else Spark-sized while this is running — two Spark
# JVMs oversubscribe the 32 vCPUs and timings inflate 10-40x.
set -euo pipefail
PREV=${1:?usage: bench_control.sh <prev-ref> [sfDir] [passes]}
SF=${2:-/root/testdata/sf0.1}
PASSES=${3:-3}
ROOT=$(git -C "$(dirname "$0")/.." rev-parse --show-toplevel)
WT=$ROOT/tmp/bench_ctl_prev
mkdir -p "$ROOT/tmp"
git -C "$ROOT" worktree remove --force "$WT" 2>/dev/null || true
git -C "$ROOT" worktree add --force "$WT" "$PREV" >/dev/null

echo "[bench-control] building + running prev ($PREV) ..."
(cd "$WT" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_PASSES="$PASSES" \
  sbt -batch "runMain graft.Bench" > "$ROOT/tmp/bench_ctl_prev.log" 2>&1)

echo "[bench-control] running HEAD ..."
(cd "$ROOT" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_PASSES="$PASSES" \
  sbt -batch "runMain graft.Bench" > "$ROOT/tmp/bench_ctl_head.log" 2>&1)

python3 "$ROOT/tools/bench_control_merge.py" \
  "$WT/BENCH.json" "$ROOT/BENCH.json" "$PREV" > "$ROOT/BENCH_control.json"
git -C "$ROOT" worktree remove --force "$WT"
cat "$ROOT/BENCH_control.json"
