#!/usr/bin/env python
"""Summarize robustness-sweep ledgers (seed_sweep / seed_sweep_vmap output).

Single ledger (per-seed table + tally, later re-runs supersede):
    python scripts/summarize_sweep.py sweep_r2/results.jsonl

Union across ledgers/tags (per-seed BEST attempt — converged first, then
highest accuracy; the "restarts permitted, schedule variants documented"
view of a campaign, e.g. decisive vmap sweep + sequential rescues):
    python scripts/summarize_sweep.py \
        sweep_vmap/results.jsonl:vmap_r3_decisive \
        sweep_r3_rescue/results.jsonl:rescue_spc_rot
A ``path:tag`` argument keeps only that tag's rows; bare paths keep all.
"""

import json
import sys


def load(arg):
    path, _, tag = arg.partition(":")
    rows = []
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            if not tag or r.get("tag") == tag:
                r["_src"] = arg
                rows.append(r)
    return rows


def main():
    args = sys.argv[1:] or ["sweep_r2/results.jsonl"]
    union = len(args) > 1 or any(":" in a for a in args)
    rows = {}
    for arg in args:
        for r in load(arg):
            key = (r["seed"],) if union else (r["seed"], r["tag"])
            prev = rows.get(key)
            # in-flight markers (written at campaign start so round cuts
            # are visible) never supersede a real result, and any real
            # result supersedes them
            if prev is not None and r.get("in_flight") \
                    and not prev.get("in_flight"):
                continue
            if prev is not None and prev.get("in_flight") \
                    and not r.get("in_flight"):
                rows[key] = r
                continue
            # single ledger: later entries (re-runs) supersede; union:
            # keep the best attempt (converged beats not, then accuracy)
            if prev is None or not union or (
                    (r["converged"], r["test_accuracy"])
                    > (prev["converged"], prev["test_accuracy"])):
                rows[key] = r
    rows = sorted(rows.values(), key=lambda r: (r["seed"], r["tag"]))
    n_conv = sum(r["converged"] for r in rows)
    print(f"{'seed':>4} {'tag':<26} {'steps':>8} {'acc':>6} "
          f"{'restarts':>8} {'min':>6}")
    for r in rows:
        flag = "  [in flight at cut]" if r.get("in_flight") else ""
        print(f"{r['seed']:>4} {r['tag']:<26} {r['final_step']:>8} "
              f"{r['test_accuracy']:>6.3f} {r['restarts']:>8} "
              f"{r['wall_minutes']:>6.1f}{flag}")
    print(f"\nconverged: {n_conv}/{len(rows)}  "
          f"(threshold: per-run stop_acc, default 0.98)")


if __name__ == "__main__":
    main()
