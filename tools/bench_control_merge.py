#!/usr/bin/env python3
"""Merge interleaved same-session graft.Bench outputs into BENCH_control.json.

Usage:
  bench_control_merge.py --prev-ref <ref> --prev a.json [b.json ...] \
      --head c.json [d.json ...]

Each binary may contribute several BENCH.json files (the harness runs
prev,HEAD,prev,HEAD so host drift within the session hits both binaries
symmetrically instead of reading as a HEAD regression); per-query times
are the MIN across that binary's runs. Output: one JSON object with both
totals, per-query times, head/prev ratios over the common queries, and
the median ratio — the single artifact a regression claim can cite.
"""
import argparse
import json
import os
import statistics
import subprocess
import sys


def merged(paths):
    """Per-query min across runs of one binary; -1 (failure) never wins."""
    runs = [json.load(open(p)) for p in paths]
    queries = {}
    for r in runs:
        for q, t in r["queries"].items():
            if t > 0:
                queries[q] = min(queries.get(q, float("inf")), t)
    errors = sorted(set.intersection(*[set(r.get("errors", [])) for r in runs]))
    return {
        "queries": queries,
        "value": sum(queries.values()),
        "errors": errors,
        "sf": runs[-1].get("sf"),
        "n_runs": len(runs),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prev-ref", required=True)
    ap.add_argument("--prev", nargs="+", required=True)
    ap.add_argument("--head", nargs="+", required=True)
    args = ap.parse_args()
    prev = merged(args.prev)
    head = merged(args.head)
    common = sorted(set(prev["queries"]) & set(head["queries"]))
    ratios = {}
    for q in common:
        p, h = prev["queries"][q], head["queries"][q]
        if p > 0 and h > 0:
            ratios[q] = round(h / p, 3)
    med = round(statistics.median(ratios.values()), 3) if ratios else None
    # resolve HEAD in the repo that produced the head BENCH.json, not the
    # invoking process's CWD — and fail loudly if git can't answer
    repo_dir = os.path.dirname(os.path.abspath(args.head[0])) or "."
    proc = subprocess.run(
        ["git", "-C", repo_dir, "rev-parse", "HEAD"],
        capture_output=True, text=True)
    if proc.returncode != 0:
        sys.exit(f"git rev-parse HEAD failed in {repo_dir}: {proc.stderr.strip()}")
    head_sha = proc.stdout.strip()
    out = {
        "prev_ref": args.prev_ref,
        "head_ref": head_sha,
        "sf": head.get("sf"),
        "interleaved_runs_per_binary": {"prev": prev["n_runs"], "head": head["n_runs"]},
        "prev_total_sec": round(prev["value"], 2),
        "prev_n_queries": len(prev["queries"]),
        "head_total_sec": round(head["value"], 2),
        "head_n_queries": len(head["queries"]),
        "n_common": len(ratios),
        "median_ratio_head_over_prev": med,
        "worst_5": dict(sorted(ratios.items(), key=lambda kv: -kv[1])[:5]),
        "best_5": dict(sorted(ratios.items(), key=lambda kv: kv[1])[:5]),
        "ratios": ratios,
        "prev_queries": prev["queries"],
        "head_queries": head["queries"],
        "prev_errors": prev["errors"],
        "head_errors": head["errors"],
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
