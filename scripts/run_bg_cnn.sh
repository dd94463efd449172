#!/bin/bash
# Background-remedy follow-up arm: CNN encoder + learn_background (the
# robust-default encoder composed with the background extension). The
# accidental first datapoint (remedies.log forensics: the duplicate
# campaign instance ran post-default-flip with CNN) hit the 0.98 target at
# bg0.3 in 80k steps; this arm reproduces it with clean folders and pushes
# to full intensity. Chained behind the MLP remedies campaign (pid $1).
cd /root/repo
WAIT_PID=${1:-0}
if [ "$WAIT_PID" != "0" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
echo "=== bg CNN arm start $(date) ==="

run_one () {
  local name=$1 train=$2 test=$3 extra=$4
  echo "=== bg cnn run: $name $(date) ==="
  timeout 7200 python training.py \
    --train-data "$train" --test-data "$test" \
    --results-folder "harder_runs/$name" --overwrite-results 1 \
    --max-steps 5 --max-digits 3 --device-data \
    --eval-every 2500 --img-every 1000000000 --grad-every 0 \
    --save-every 1000000000 --log-every 25000 \
    --stop-at-accuracy 0.98 --anneal-hold 15000 \
    --steps 150000 --stall-restart-step 60000 \
    $extra 2>&1 | tail -4
}

run_one "learnbg_cnn0.3" "harder_bg0.3_data/common.airrec" \
  "harder_bg0.3_data/test.airrec" "--learn-background"
run_one "learnbg_cnn1.0" "harder_bg1.0_data/common.airrec" \
  "harder_bg1.0_data/test.airrec" "--learn-background"
run_one "learnbg_cnn0.6" "harder_bg0.6_data/common.airrec" \
  "harder_bg0.6_data/test.airrec" "--learn-background"
run_one "learnbg_cnn0.15" "harder_bg0.15_data/common.airrec" \
  "harder_bg0.15_data/test.airrec" "--learn-background"
echo "=== bg CNN arm done $(date) ==="
