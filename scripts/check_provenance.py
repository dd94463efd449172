"""Mechanical provenance for RESULTS.md's headline union statistics.

The per-seed "union" tables (best accuracy per seed across ledger tags,
restarts permitted) are the repo's headline robustness numbers — the
analog of the reference's 10/10-runs-converge claim
(/root/reference/README.md:18). This script recomputes each union
directly from the committed sweep ledgers (`sweep_*/results.jsonl`) so
the claims are checkable without trusting the prose:

    python scripts/check_provenance.py          # prints the unions as JSON

tests/test_provenance.py runs the same computation and cross-checks the
tables in RESULTS.md against it (no table value may exceed the ledger
evidence).
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Every union is: best accuracy per seed over (ledger file, tag set).
# Tags group by configuration; a union is only meaningful across runs of
# the SAME model config (only data order, restart policy, and schedule
# rotation may differ — the degrees of freedom "restarts permitted"
# grants).
UNIONS = {
    # Raw-pixel encoder on the synthetic-glyph set (reference driver
    # config + hold-15k; RESULTS.md "Union: 9/10" table).
    "raw_pixel_synthetic": [
        ("sweep_r2/results.jsonl", {"hold15000"}),
        ("sweep_vmap/results.jsonl",
         {"vmap_hold15000", "vmap_hold15000_scalecur",
          "vmap_hold15000_scalecur_rot", "vmap_hold15000_scalecur_float32",
          "vmap_hold15000_scalecur_bfloat16",
          "vmap_rescue_scalecur_rot_pinned"}),
        ("sweep_r3_rescue/results.jsonl", {"rescue_spc_rot"}),
        ("sweep_r4_rescue/results.jsonl", None),  # all tags are raw-pixel
    ],
    # Robust default (CNN) on the real-handwriting UCI-digit set
    # (RESULTS.md "Real-handwriting union" row — 10/10 target).
    "real_cnn": [
        ("sweep_real/results.jsonl",
         {"vmap_real_hold15000_cnn", "vmap_real_cnn_rescue",
          "vmap_real_cnn_rescue8"}),
    ],
    # Raw-pixel config on the real-handwriting set.
    "real_raw_pixel": [
        ("sweep_real/results.jsonl",
         {"vmap_real_hold15000_scalecur", "vmap_real_scalecur_rescue"}),
    ],
}


def union(sources, repo=REPO):
    """Best accuracy per seed across the given (jsonl, tag set) sources.

    tag set None means every tag in the file. Skips in-flight rows
    (placeholders written at sweep start for crash visibility).
    """
    best = {}
    for rel, tags in sources:
        path = os.path.join(repo, rel)
        with open(path) as f:
            for line in f:
                row = json.loads(line)
                if row.get("in_flight"):
                    continue
                if tags is not None and row.get("tag") not in tags:
                    continue
                seed = row["seed"]
                acc = float(row["test_accuracy"])
                if acc > best.get(seed, -1.0):
                    best[seed] = acc
    return best


def compute_all(repo=REPO):
    return {name: union(sources, repo) for name, sources in UNIONS.items()}


if __name__ == "__main__":
    out = {}
    for name, per_seed in compute_all().items():
        out[name] = {
            "per_seed": {str(s): round(a, 4)
                         for s, a in sorted(per_seed.items())},
            "n_converged_0.98": sum(a >= 0.98 for a in per_seed.values()),
            "n_seeds": len(per_seed),
        }
    json.dump(out, sys.stdout, indent=1)
    print()
