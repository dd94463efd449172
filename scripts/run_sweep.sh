#!/bin/bash
# Sequential 10-seed robustness sweep (VERDICT item 2).
cd /root/repo
for s in 0 1 2 3 4 5 6 7 8 9; do
  echo "=== seed $s $(date) ==="
  timeout 7200 python scripts/seed_sweep.py "$s" \
    --data multi_mnist_data --out sweep_r2 \
    --hold 15000 --stall-restart 60000 \
    --max-iters 250000 --stop-acc 0.98 2>&1 | tail -4
done
echo "=== sweep done $(date) ==="
