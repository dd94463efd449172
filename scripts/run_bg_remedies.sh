#!/bin/bash
# Harder-scenes background remedies (VERDICT #3): the fixed-intensity sweep
# collapses to ~random for every bg_max_intensity >= 0.15 (the model spends
# z_pres steps painting the background — harder_runs/bg*/summary). Two
# framework levers, evaluated on the REAL composited test sets:
#   A. learn_background: a learned static background canvas absorbs the
#      texture so steps stay digit-only (models/config.py).
#   B. background-intensity curriculum: train on the CLEAN dataset with
#      on-device compositing ramped 0 -> target (train/steps.py).
# Chained behind the seed-rerun campaign (pid $1).
cd /root/repo
WAIT_PID=${1:-0}
if [ "$WAIT_PID" != "0" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
echo "=== bg remedies campaign start $(date) ==="

run_one () {
  local name=$1 train=$2 test=$3 extra=$4
  echo "=== bg remedy run: $name $(date) ==="
  timeout 7200 python training.py \
    --train-data "$train" --test-data "$test" \
    --results-folder "harder_runs/$name" --overwrite-results 1 \
    --max-steps 5 --max-digits 3 --device-data \
    --eval-every 2500 --img-every 1000000000 --grad-every 0 \
    --save-every 1000000000 --log-every 25000 \
    --stop-at-accuracy 0.98 --anneal-hold 15000 --no-cnn \
    --steps 150000 --stall-restart-step 60000 \
    $extra 2>&1 | tail -4
  # --no-cnn: the fixed-intensity baseline sweep (harder_runs/bg*) ran the
  # MLP encoder; keep everything but the remedy under test identical
}

# A: learned background, trained directly on the composited data
for I in 0.3 1.0 0.15 0.6; do
  run_one "learnbg$I" "harder_bg${I}_data/common.airrec" \
    "harder_bg${I}_data/test.airrec" "--learn-background"
done

# B: curriculum-only at 0.3 (clean train data, composite ramped in on
# device; eval on the real composited test set)
run_one "curriculum0.3" "harder_clean_data/common.airrec" \
  "harder_bg0.3_data/test.airrec" \
  "--bg-composite-kind noise --bg-target 0.3 --bg-start 15000 --bg-ramp 45000"

# A+B at full intensity: learned background + ramped compositing
run_one "learnbg_cur1.0" "harder_clean_data/common.airrec" \
  "harder_bg1.0_data/test.airrec" \
  "--learn-background --bg-composite-kind noise --bg-target 1.0 --bg-start 15000 --bg-ramp 45000"

echo "=== bg remedies campaign done $(date) ==="
