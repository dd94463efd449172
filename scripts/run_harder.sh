#!/bin/bash
# Post-sweep chained campaign (strictly sequential — one CPU core, one TPU):
#   1. eval-mode bench, XLA vs Pallas ST (TPU, minutes)
#   2. DP weak-scaling bench on the virtual CPU mesh (CPU, minutes)
#   3. harder scenes (BASELINE config 3): clean 0-3 digits / 5 steps, then
#      the bg_max_intensity sweep (TPU, hours)
# Waits for the seed sweep (pid $1) to exit first.
cd /root/repo
SWEEP_PID=${1:-0}
if [ "$SWEEP_PID" != "0" ]; then
  while kill -0 "$SWEEP_PID" 2>/dev/null; do sleep 60; done
fi
echo "=== sweep finished; starting chained campaign $(date) ==="

echo "--- eval bench: xla vs pallas ST ---"
timeout 900 python bench.py --eval --steps 200 --st-impl xla 2>&1 | tail -2
timeout 900 python bench.py --eval --steps 200 --st-impl pallas 2>&1 | tail -2
echo "--- train bench (today's chip, for the record) ---"
timeout 900 python bench.py --steps 200 2>&1 | tail -2

echo "--- DP weak-scaling bench (virtual 8-CPU mesh) ---"
timeout 3600 python bench.py --data-parallel 2>&1 | tail -3

run_harder () {
  local name=$1 data=$2 extra=$3
  echo "=== harder run: $name $(date) ==="
  timeout 7200 python training.py \
    --train-data "$data/common.airrec" --test-data "$data/test.airrec" \
    --results-folder "harder_runs/$name" --overwrite-results 1 \
    --max-steps 5 --max-digits 3 --device-data \
    --eval-every 2500 --img-every 1000000000 --grad-every 0 \
    --save-every 1000000000 --log-every 25000 \
    --stop-at-accuracy 0.98 --anneal-hold 15000 \
    $extra 2>&1 | tail -6
}

run_harder clean harder_clean_data \
  "--steps 150000 --stall-restart-step 60000"
for I in 0.15 0.3 0.6 1.0; do
  run_harder "bg$I" "harder_bg${I}_data" "--steps 120000"
done
echo "=== chained campaign done $(date) ==="
