#!/bin/bash
# Round-5 chip queue, take 4: the band240k stage (VERDICT r4 task 6),
# the one stage of run_r5c.sh that never got chip time. Fresh session
# wiped the gitignored data folders, so the three texture datasets are
# regenerated first (same generator flags as run_polish19_r4.sh).
# Order = closest-to-target first (pattern2 0.976 @ 117.5k cap edge,
# portrait2 0.974/0.978-s1, abstract2 0.949/0.961-s1) so a wall-clock
# cut still upgrades the most likely row. Each run commits its ledger
# immediately (crash-durable evidence, round-4 lesson).
cd /root/repo

run_harder () {
  local name=$1 data=$2 steps=$3; shift 3
  echo "=== band240k run: $name $(date) ==="
  timeout 3600 python training.py \
    --train-data "$data/common.airrec" --test-data "$data/test.airrec" \
    --results-folder "harder_runs/$name" --overwrite-results 1 \
    --max-steps 5 --max-digits 3 --device-data \
    --eval-every 2500 --img-every 1000000000 --grad-every 0 \
    --save-every 1000000000 --log-every 25000 \
    --stop-at-accuracy 0.98 --anneal-hold 15000 --steps "$steps" \
    --learn-background --bg-init data "$@" 2>&1 | tail -4
  python scripts/ledger.py "harder_runs/$name" --name "$name" \
    --note "training.py --max-steps 5 --max-digits 3 --anneal-hold 15000 \
--stop-at-accuracy 0.98 --steps $steps --learn-background --bg-init data $*; \
data: generate_multi_mnist.py --max-digits 3 --images-per-digit 10000 \
--test-set-size 1000 ($data)"
  git add "harder_runs/ledgers/${name}.json"
  git commit -q -m "band240k ledger: $name" || true
}

run_harder r5_ref_pattern2_cnn_240k harder_ref_pattern2_data 240000
run_harder r5_ref_portrait2_cnn_240k harder_ref_portrait2_data 240000
run_harder r5_ref_abstract2_cnn_240k harder_ref_abstract2_data 240000
echo "=== band240k done $(date) ==="
