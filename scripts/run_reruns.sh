#!/bin/bash
# Final-config re-runs of the robustness sweep's failed seeds: the frozen
# default recipe (hold-15k base + stall auto-recovery with the enriched
# schedule rotation, data-order re-seeding, 5-restart budget). Chained
# behind the harder-scenes campaign (pid $1).
cd /root/repo
WAIT_PID=${1:-0}
if [ "$WAIT_PID" != "0" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
echo "=== re-runs start $(date) ==="
for s in "$@"; do
  [ "$s" = "$WAIT_PID" ] && continue
  echo "=== re-run seed $s $(date) ==="
  timeout 7200 python scripts/seed_sweep.py "$s" \
    --data multi_mnist_data --out sweep_r2 \
    --hold 15000 --stall-restart 60000 --max-restarts 5 \
    --max-iters 250000 --stop-acc 0.98 2>&1 | tail -3
done
echo "=== re-runs done $(date) ==="
