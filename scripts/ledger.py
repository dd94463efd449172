#!/usr/bin/env python
"""Extract a compact, committable ledger record from a training run's
results folder (summary/metrics.jsonl) — the durable-evidence pattern of
the sweep ledgers (sweep_*/results.jsonl) applied to single runs
(VERDICT r3: harder-scenes claims must resolve to committed files).

Usage:
    python scripts/ledger.py RESULTS_FOLDER [--name NAME] \
        [--out harder_runs/ledgers/NAME.json] [--note "..."]

Writes one JSON file with: the full eval-accuracy trajectory (downsampled
to <= 200 points), best/final accuracy and step, recovery events, and an
optional free-text note recording the exact command/config.
"""

import argparse
import json
import os


def extract(folder: str) -> dict:
    path = os.path.join(folder, "summary", "metrics.jsonl")
    evals = []            # (step, accuracy) in write order
    recovery = []
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            if "test/accuracy" in r:
                evals.append((int(r["step"]), float(r["test/accuracy"])))
            if "recovery/attempt_ended" in r:
                recovery.append({
                    "attempt": int(r["recovery/attempt_ended"]),
                    "stalled_at_step": int(r["step"]),
                    "stalled_accuracy":
                        round(float(r["recovery/stalled_accuracy"]), 4),
                    "next_variant": int(r["recovery/next_variant"])})
    if not evals:
        raise SystemExit(f"no test/accuracy rows in {path}")
    best_step, best_acc = max(evals, key=lambda e: e[1])
    # keep the trajectory committable: <= 200 evenly-spaced points, but
    # always the best and the final point
    stride = max(1, len(evals) // 200)
    keep = set(range(0, len(evals), stride)) | {len(evals) - 1,
                                                evals.index((best_step,
                                                             best_acc))}
    traj = [evals[i] for i in sorted(keep)]
    return {
        "folder": folder,
        "final_step": evals[-1][0],
        "final_accuracy": round(evals[-1][1], 4),
        "best_accuracy": round(best_acc, 4),
        "best_step": best_step,
        "n_evals": len(evals),
        "restarts": len(recovery),
        "recovery_events": recovery,
        "eval_trajectory": [[s, round(a, 4)] for s, a in traj],
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("folder")
    p.add_argument("--name", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--note", default="")
    args = p.parse_args()
    name = args.name or os.path.basename(os.path.normpath(args.folder))
    rec = extract(args.folder)
    rec["name"] = name
    if args.note:
        rec["note"] = args.note
    out = args.out or os.path.join("harder_runs", "ledgers", f"{name}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"{out}: best {rec['best_accuracy']} @ {rec['best_step']}, "
          f"final {rec['final_accuracy']} @ {rec['final_step']}, "
          f"{rec['restarts']} restarts")


if __name__ == "__main__":
    main()
