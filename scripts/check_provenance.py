"""Mechanical provenance for RESULTS.md's headline claims.

The per-seed "union" tables (best accuracy per seed across ledger tags,
restarts permitted) are the repo's headline robustness numbers — the
analog of the reference's 10/10-runs-converge claim
(/root/reference/README.md:18). This script recomputes each union
directly from the committed sweep ledgers (`sweep_*/results.jsonl`) so
the claims are checkable without trusting the prose:

    python scripts/check_provenance.py          # prints the unions as JSON

Round 5 extends coverage to the two claim classes that drifted in round
4 (VERDICT r4 weak #1):

- the 19-texture map: per-texture one-run and union bests recomputed
  from `harder_runs/ledgers/*_ref_<texture>_cnn*.json`;
- citation resolution: every sweep tag cited in RESULTS.md/README.md
  must resolve to at least one COMPLETED row in a committed ledger
  (round 4 shipped a citation to a sweep that never ran), and every
  cited `harder_runs/ledgers/*.json` path must exist.

tests/test_provenance.py runs the same computations and cross-checks the
tables in RESULTS.md against them (no table value may exceed the ledger
evidence, and the headline convergence counts must hold).
"""

import glob
import json
import os
import re
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
    # Raw-pixel config on the real-handwriting set (incl. the round-4
    # S=1 re-rolls and the round-5 raw-pixel-specific remedies — the
    # missing _reroll tag here is how the 6/10-vs-7/10 doc drift slipped
    # past round 4's provenance test).
    # Schedule variants (h30k) and program-shape re-rolls (S=1/S=3) are
    # legitimate union members ("restarts permitted" grants schedule and
    # attempt freedom); the bicubic arm is NOT — it changes the dataset,
    # so it gets its own table, never a union row.
    "real_raw_pixel": [
        ("sweep_real/results.jsonl",
         {"vmap_real_hold15000_scalecur", "vmap_real_scalecur_rescue",
          "vmap_real_scalecur_reroll", "vmap_real_scalecur_h30k",
          "vmap_real_scalecur_reroll3"}),
    ],
}

# The reference's 19 shipped background textures
# (/root/reference/backgrounds/*.png).
TEXTURES = [
    "abstract1", "abstract2", "abstract3",
    "blob1", "blob2", "blob3", "blob4",
    "gray1", "gray2", "gray3",
    "pattern1", "pattern2", "pattern3", "pattern4", "pattern5",
    "portrait1", "portrait2", "portrait3", "portrait4",
]


def union(sources, repo=REPO):
    """Best accuracy per seed across the given (jsonl, tag set) sources.

    tag set None means every tag in the file. Skips in-flight rows
    (placeholders written at sweep start for crash visibility) AND
    crashed rows: a crashed row reports best-so-far across attempts, so a
    transient eval peak from a run that later died must not mark a seed
    converged (advisor r4) — a union entry requires a row from a sweep
    that ran to completion.
    """
    best = {}
    for rel, tags in sources:
        path = os.path.join(repo, rel)
        with open(path) as f:
            for line in f:
                row = json.loads(line)
                if row.get("in_flight") or row.get("crashed"):
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


def texture_map(repo=REPO):
    """Per-texture evidence from the committed harder-run ledgers.

    Returns {texture: {"one_run": best of the seed-0 r4 run,
                       "union": best across ALL committed runs of that
                                texture (seed re-rolls, extended caps)}}.
    A "run" is one training.py process with the robust default's
    auto-restart budget (`scripts/ledger.py` output).
    """
    out = {}
    for t in TEXTURES:
        base = os.path.join(repo, "harder_runs", "ledgers",
                            f"r4_ref_{t}_cnn.json")
        with open(base) as f:
            one_run = float(json.load(f)["best_accuracy"])
        best = one_run
        for path in glob.glob(os.path.join(
                repo, "harder_runs", "ledgers", f"r*_ref_{t}_cnn*.json")):
            with open(path) as f:
                best = max(best, float(json.load(f)["best_accuracy"]))
        out[t] = {"one_run": one_run, "union": best}
    return out


def all_sweep_tags(repo=REPO):
    """Every tag across the sweep ledgers -> True if it has at least one
    COMPLETED (non-in-flight, non-crashed) row."""
    tags = {}
    for path in glob.glob(os.path.join(repo, "sweep_*", "results.jsonl")):
        with open(path) as f:
            for line in f:
                row = json.loads(line)
                tag = row.get("tag")
                done = not (row.get("in_flight") or row.get("crashed"))
                tags[tag] = tags.get(tag, False) or done
    return tags


# A backtick-quoted token is a sweep-tag citation if it matches the tag
# grammar the sweepers generate. Plain identifiers (function names etc.)
# don't collide: the prefixes below are unique to ledger tags.
_TAG_RE = re.compile(r"`([a-z0-9_]+)`")
_TAG_SHAPE = re.compile(
    r"^(vmap_|rescue_|patience_|seed8_|hold\d+)[a-z0-9_]*$")


def cited_tags(text):
    """Sweep tags cited (backtick-quoted) in a markdown document."""
    return {m for m in _TAG_RE.findall(text) if _TAG_SHAPE.match(m)}


# Any cited evidence file: harder_runs/ (ledgers, bench grids) or a
# sweep ledger dir. Round 4's drift was a `harder_runs/*.jsonl` citation
# the old ledgers/-only regex never looked at.
_LEDGER_PATH_RE = re.compile(
    r"`?((?:harder_runs|sweep_\w+)/[\w./{},-]+\.jsonl?)`?")


def cited_ledger_paths(text):
    """Evidence-file paths (.json/.jsonl under harder_runs/ or sweep_*/)
    cited in a markdown document. Supports the `r4_ref_{a,b}_cnn.json`
    brace shorthand."""
    paths = set()
    for raw in _LEDGER_PATH_RE.findall(text):
        m = re.match(r"^(.*)\{([\w,]+)\}(.*)$", raw)
        if m:
            for alt in m.group(2).split(","):
                paths.add(m.group(1) + alt + m.group(3))
        else:
            paths.add(raw)
    return paths


def _git_tracked(repo=REPO):
    """Set of git-tracked paths (empty if git is unavailable)."""
    import subprocess
    try:
        out = subprocess.run(["git", "-C", repo, "ls-files"],
                             capture_output=True, text=True, check=True)
    except Exception:
        return None
    return set(out.stdout.splitlines())


def check_citations(repo=REPO, docs=("RESULTS.md", "README.md")):
    """Every cited tag resolves to a completed ledger row; every cited
    evidence path exists AND is git-tracked (an on-disk-but-untracked
    ledger dies at round recycling — round 4 shipped three of those).
    Returns a list of problems (empty = clean)."""
    tags = all_sweep_tags(repo)
    tracked = _git_tracked(repo)
    problems = []
    for doc in docs:
        with open(os.path.join(repo, doc)) as f:
            text = f.read()
        for tag in sorted(cited_tags(text)):
            if tag not in tags:
                problems.append(f"{doc}: cited tag `{tag}` appears in NO "
                                f"committed sweep ledger")
            elif not tags[tag]:
                problems.append(f"{doc}: cited tag `{tag}` has only "
                                f"in-flight/crashed ledger rows — the "
                                f"sweep never completed")
        for rel in sorted(cited_ledger_paths(text)):
            if not os.path.exists(os.path.join(repo, rel)):
                problems.append(f"{doc}: cited ledger path {rel} does not "
                                f"exist")
            elif tracked is not None and rel not in tracked:
                problems.append(f"{doc}: cited ledger path {rel} exists "
                                f"but is NOT git-tracked (would be lost "
                                f"at round recycling)")
    return problems


if __name__ == "__main__":
    out = {}
    for name, per_seed in compute_all().items():
        out[name] = {
            "per_seed": {str(s): round(a, 4)
                         for s, a in sorted(per_seed.items())},
            "n_converged_0.98": sum(a >= 0.98 for a in per_seed.values()),
            "n_seeds": len(per_seed),
        }
    tex = texture_map()
    out["textures_19"] = {
        "per_texture": tex,
        "one_run_ge_0.95": sum(v["one_run"] >= 0.95 for v in tex.values()),
        "one_run_ge_0.98": sum(v["one_run"] >= 0.98 for v in tex.values()),
        "union_ge_0.95": sum(v["union"] >= 0.95 for v in tex.values()),
        "union_ge_0.98": sum(v["union"] >= 0.98 for v in tex.values()),
    }
    out["citation_problems"] = check_citations()
    json.dump(out, sys.stdout, indent=1)
    print()
    if out["citation_problems"]:
        sys.exit(1)
