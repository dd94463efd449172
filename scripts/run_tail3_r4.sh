#!/bin/bash
# Round-4 third tail (runs after run_tail2_r4.sh):
#   1. Seed-8 raw-pixel, the one untried policy: sequential re-seed-only
#      restarts that KEEP the strong schedule (hold-15k + scale-prior
#      curriculum). Every prior sequential campaign rotated restarts onto
#      the weaker variant schedules (DEFAULT_RESTART_ROTATION), so the
#      strong schedule only ever ran at literal seed 8 (deterministic
#      failure); fresh-seed attempts at the strong schedule happened only
#      inside S=10 vmap programs, whose fusion numerics are known to make
#      the raw-pixel basin stickier (RESULTS.md round-3 unroll
#      attribution). --rotate 0 gives fresh (init, data-order) attempts
#      at the strong schedule under sequential pinned numerics.
#   2. The remaining 11 reference textures -> 19/19 ceiling map.
cd /root/repo

echo "=== seed 8 rotate-0 rescue arm 1 (stride 1009) $(date) ==="
timeout 5400 python scripts/seed_sweep.py 8 --data multi_mnist_data \
  --out sweep_r4_rescue --scale-prior-curriculum \
  --stall-restart 60000 --rotate 0 --max-restarts 6 \
  --tag rescue_spc_noro > /tmp/r4_s8_noro1.log 2>&1
tail -2 /tmp/r4_s8_noro1.log

if ! python - <<'EOF'
import json, sys
rows = [json.loads(l) for l in open("sweep_r4_rescue/results.jsonl")]
sys.exit(0 if any(r.get("tag") == "rescue_spc_noro" and r.get("converged")
                  for r in rows) else 1)
EOF
then
  echo "=== arm 1 failed; rotate-0 arm 2 (stride 2503) $(date) ==="
  timeout 5400 python scripts/seed_sweep.py 8 --data multi_mnist_data \
    --out sweep_r4_rescue --scale-prior-curriculum \
    --stall-restart 60000 --rotate 0 --max-restarts 6 \
    --attempt-stride 2503 --tag rescue_spc_noro_s2503 \
    > /tmp/r4_s8_noro2.log 2>&1
  tail -2 /tmp/r4_s8_noro2.log
fi

bash scripts/run_bg_r4.sh rest19
echo "=== tail3 done $(date) ==="
