#!/usr/bin/env python
"""Summarize a robustness-sweep ledger (scripts/seed_sweep.py output).

Prints the per-seed table plus the headline tally used in RESULTS.md:
``python scripts/summarize_sweep.py sweep_r2/results.jsonl``.
"""

import json
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "sweep_r2/results.jsonl"
    rows = {}
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            # later entries for a seed (re-runs) supersede earlier ones
            rows[(r["seed"], r["tag"])] = r
    rows = sorted(rows.values(), key=lambda r: (r["seed"], r["tag"]))
    n_conv = sum(r["converged"] for r in rows)
    print(f"{'seed':>4} {'tag':<22} {'steps':>8} {'acc':>6} "
          f"{'restarts':>8} {'min':>6}")
    for r in rows:
        print(f"{r['seed']:>4} {r['tag']:<22} {r['final_step']:>8} "
              f"{r['test_accuracy']:>6.3f} {r['restarts']:>8} "
              f"{r['wall_minutes']:>6.1f}")
    print(f"\nconverged: {n_conv}/{len(rows)}  "
          f"(threshold: per-run stop_acc, default 0.98)")


if __name__ == "__main__":
    main()
