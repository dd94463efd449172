"""Durable-evidence tooling: scripts/ledger.py (per-run committable
records, VERDICT r3 missing #4) and scripts/summarize_sweep.py's
precedence rules for in-flight / crashed / final ledger rows."""

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_metrics(folder, rows):
    os.makedirs(os.path.join(folder, "summary"), exist_ok=True)
    with open(os.path.join(folder, "summary", "metrics.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_ledger_extract(tmp_path):
    ledger = _load(os.path.join(REPO, "scripts", "ledger.py"), "ledger_mod")
    run = str(tmp_path / "run")
    rows = [{"step": s, "test/accuracy": a}
            for s, a in [(0, 0.3), (2500, 0.55), (5000, 0.91),
                         (7500, 0.88), (10000, 0.90)]]
    rows.insert(3, {"step": 5000, "recovery/attempt_ended": 0,
                    "recovery/stalled_accuracy": 0.91,
                    "recovery/next_variant": 1})
    _write_metrics(run, rows)
    rec = ledger.extract(run)
    assert rec["final_step"] == 10000
    assert rec["final_accuracy"] == 0.90
    assert rec["best_accuracy"] == 0.91 and rec["best_step"] == 5000
    assert rec["n_evals"] == 5
    assert rec["restarts"] == 1
    assert rec["recovery_events"][0]["next_variant"] == 1
    # trajectory keeps best and final points
    assert [5000, 0.91] in rec["eval_trajectory"]
    assert rec["eval_trajectory"][-1] == [10000, 0.90]


def test_ledger_trajectory_downsampled(tmp_path):
    ledger = _load(os.path.join(REPO, "scripts", "ledger.py"), "ledger_mod")
    run = str(tmp_path / "long")
    _write_metrics(run, [{"step": s, "test/accuracy": s / 1e6}
                         for s in range(0, 1000_000, 1000)])
    rec = ledger.extract(run)
    assert rec["n_evals"] == 1000
    assert len(rec["eval_trajectory"]) <= 202     # committable size
    assert rec["eval_trajectory"][-1][0] == 999000


def test_summarize_precedence(tmp_path):
    """in-flight markers never supersede real rows; any real row (incl.
    crashed) supersedes an in-flight one; later real rows supersede."""
    led = tmp_path / "results.jsonl"
    rows = [
        {"seed": 0, "tag": "t", "in_flight": True, "final_step": 0,
         "test_accuracy": 0.0, "converged": False, "restarts": 0,
         "wall_minutes": 0.0},
        {"seed": 1, "tag": "t", "in_flight": True, "final_step": 0,
         "test_accuracy": 0.0, "converged": False, "restarts": 0,
         "wall_minutes": 0.0},
        # seed 0: crashed attempt row, then the rerun's final row
        {"seed": 0, "tag": "t", "final_step": 120000, "test_accuracy": 0.66,
         "converged": False, "restarts": 1, "wall_minutes": 41.0,
         "crashed": True},
        {"seed": 0, "tag": "t", "final_step": 80000, "test_accuracy": 0.99,
         "converged": True, "restarts": 1, "wall_minutes": 28.0},
        # a later in-flight marker (relaunch) must NOT clobber seed 0
        {"seed": 0, "tag": "t", "in_flight": True, "final_step": 0,
         "test_accuracy": 0.0, "converged": False, "restarts": 0,
         "wall_minutes": 0.0},
    ]
    with open(led, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "summarize_sweep.py"),
         str(led)], capture_output=True, text=True, check=True).stdout
    lines = [ln for ln in out.splitlines() if ln.strip().startswith(("0", "1"))]
    seed0 = next(ln for ln in lines if ln.strip().startswith("0"))
    seed1 = next(ln for ln in lines if ln.strip().startswith("1"))
    assert "0.990" in seed0 and "in flight" not in seed0
    assert "in flight at cut" in seed1       # never superseded -> visible
    assert "converged: 1/2" in out
