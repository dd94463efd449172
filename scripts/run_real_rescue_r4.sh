#!/bin/bash
# Round-4 real-digits rescue pass: the first 10-seed CNN sweep on the real
# sklearn/UCI handwritten digits converged 5/10 strictly (+ s6 at 0.974
# cut by max_iters). The rotation variants DID rescue replicas there
# (s2 variant 1, s9 variant 2) — the failures simply exhausted the
# 3-restart budget. Re-run the open seeds with double the budget and a
# longer post-restart runway; include seed 6 (needs runway, not rescue).
cd /root/repo

echo "=== real-digits CNN rescue sweep (seeds 3 4 5 6 8) $(date) ==="
timeout 10800 python scripts/seed_sweep_vmap.py 3 4 5 6 8 --cnn \
  --data real_digits_data --out sweep_real --max-restarts 6 \
  --max-iters 250000 --post-restart-iters 120000 \
  --tag vmap_real_cnn_rescue > /tmp/r4_real_rescue_sweep.log 2>&1
tail -12 /tmp/r4_real_rescue_sweep.log
echo "=== real rescue done $(date) ==="
