#!/usr/bin/env bash
# Same-session paired bench: the previous round's code and HEAD, built once
# each and run INTERLEAVED (prev, HEAD, prev, HEAD) on one host, so
# regression claims don't rest on cross-session VM variance — and so
# monotone drift WITHIN the session (the round-6 confound: prev always ran
# first, so a slowing host read as a fake HEAD regression) hits both
# binaries symmetrically. Per-query times are min-of the two runs of each
# binary (merged by bench_control_merge.py).
#
# Usage: tools/bench_control.sh <prev-ref> [sfDir] [passes-per-run]
# Emits BENCH_control.json at the repo root: both totals, per-query times,
# and common-query ratios (head/prev) with the median.
#
# NEVER run anything else Spark-sized while this is running — two Spark
# JVMs oversubscribe the 32 vCPUs and timings inflate 10-40x.
set -euo pipefail
PREV=${1:?usage: bench_control.sh <prev-ref> [sfDir] [passes-per-run]}
SF=${2:-/root/testdata/sf0.1}
PASSES=${3:-2}
ROOT=$(git -C "$(dirname "$0")/.." rev-parse --show-toplevel)
WT=$ROOT/tmp/bench_ctl_prev
mkdir -p "$ROOT/tmp"
git -C "$ROOT" worktree remove --force "$WT" 2>/dev/null || true
git -C "$ROOT" worktree add --force "$WT" "$PREV" >/dev/null

run_bench() { # run_bench <dir> <tag>
  (cd "$1" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_PASSES="$PASSES" \
    sbt -batch "runMain graft.Bench" > "$ROOT/tmp/bench_ctl_$2.log" 2>&1)
  cp "$1/BENCH.json" "$ROOT/tmp/bench_ctl_$2.json"
}

echo "[bench-control] pass 1/2: prev ($PREV) ..."
run_bench "$WT" prev1
echo "[bench-control] pass 1/2: HEAD ..."
run_bench "$ROOT" head1
echo "[bench-control] pass 2/2: prev ($PREV) ..."
run_bench "$WT" prev2
echo "[bench-control] pass 2/2: HEAD ..."
run_bench "$ROOT" head2

python3 "$ROOT/tools/bench_control_merge.py" --prev-ref "$PREV" \
  --prev "$ROOT/tmp/bench_ctl_prev1.json" "$ROOT/tmp/bench_ctl_prev2.json" \
  --head "$ROOT/tmp/bench_ctl_head1.json" "$ROOT/tmp/bench_ctl_head2.json" \
  > "$ROOT/BENCH_control.json"
git -C "$ROOT" worktree remove --force "$WT"
cat "$ROOT/BENCH_control.json"
