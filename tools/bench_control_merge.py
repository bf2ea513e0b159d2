#!/usr/bin/env python3
"""Merge two same-session graft.Bench outputs into BENCH_control.json.

Usage: bench_control_merge.py <prev BENCH.json> <head BENCH.json> <prev-ref>

Output: one JSON object with both totals, per-query times, head/prev
ratios over the common queries, and the median ratio — the single
artifact a regression claim can cite.
"""
import json
import statistics
import subprocess
import sys


def main():
    prev_path, head_path, prev_ref = sys.argv[1], sys.argv[2], sys.argv[3]
    prev = json.load(open(prev_path))
    head = json.load(open(head_path))
    common = sorted(set(prev["queries"]) & set(head["queries"]))
    ratios = {}
    for q in common:
        p, h = prev["queries"][q], head["queries"][q]
        if p > 0 and h > 0:
            ratios[q] = round(h / p, 3)
    med = round(statistics.median(ratios.values()), 3) if ratios else None
    head_sha = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True
    ).stdout.strip()
    out = {
        "prev_ref": prev_ref,
        "head_ref": head_sha,
        "sf": head.get("sf"),
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
        "prev_errors": prev.get("errors", []),
        "head_errors": head.get("errors", []),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
