#!/bin/bash
# Round-4 real-handwriting + scaled-config TPU queue (VERDICT r3 #1, #3).
# Chains jobs on the single chip after the CNN real-digits sweep frees it:
#   1. raw-pixel (MLP + scale-curriculum) 10-seed vmap sweep on the real
#      sklearn/UCI handwritten digits (robust raw-pixel default config)
#   2. disjoint-pool generalization: robust-default CNN run on
#      real_digits_train_data (first 1400 digits), then eval_checkpoint
#      on real_digits_holdout_data's test set (397 UNSEEN digits)
#   3. scaled-config (BASELINE 4) training run: 100x100 / 512-LSTM /
#      b1024 with batch-scaled annealing (--anneal-iters 190 ~= the
#      reference 3000-iteration decade at b64, measured in data seen)
cd /root/repo

wait_for_pid () {
  local pidfile=$1
  [ -f "$pidfile" ] || return 0
  local pid=$(cat "$pidfile")
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
}

wait_for_pid /tmp/sweep_real_cnn2.pid
echo "=== 1. raw-pixel real-digits sweep $(date) ==="
timeout 10800 python scripts/seed_sweep_vmap.py 0 1 2 3 4 5 6 7 8 9 \
  --scale-curriculum --data real_digits_data --out sweep_real \
  --tag vmap_real_hold15000_scalecur 2>&1 | tail -30

echo "=== 2. disjoint-pool generalization run $(date) ==="
timeout 7200 python training.py \
  --train-data real_digits_train_data/common.airrec \
  --test-data real_digits_train_data/test.airrec \
  --results-folder harder_runs/r4_real_disjoint --overwrite-results 1 \
  --device-data --eval-every 2500 --img-every 1000000000 --grad-every 0 \
  --save-every 1000000000 --log-every 25000 \
  --stop-at-accuracy 0.98 --steps 150000 2>&1 | tail -6
python scripts/ledger.py harder_runs/r4_real_disjoint \
  --name r4_real_disjoint \
  --note "robust-default CNN on real_digits_train_data (sklearn digits 0:1400); holdout eval below uses real_digits_holdout_data test set (digits 1400:1797, DISJOINT pool)"
echo "--- holdout eval (unseen handwriting pool) ---"
timeout 1800 python scripts/eval_checkpoint.py \
  --model-path harder_runs/r4_real_disjoint/models \
  --test-data real_digits_holdout_data/test.airrec 2>&1 | tail -15

echo "=== 3. scaled-config training run $(date) ==="
timeout 7200 python training.py \
  --train-data /root/data/scaled_100_data/common.airrec \
  --test-data /root/data/scaled_100_data/test.airrec \
  --results-folder harder_runs/r4_scaled_train --overwrite-results 1 \
  --no-resume --device-data --multi-step 20 --batch-size 1024 \
  --canvas-size 100 --rnn-units 512 --vae-latent 100 \
  --steps 15000 --eval-every 500 --anneal-iters 190 --anneal-hold 940 \
  --stall-restart-step 0 --img-every 1000000000 --grad-every 0 \
  --save-every 1000000000 --log-every 500 --seed 0 2>&1 | tail -8
python scripts/ledger.py harder_runs/r4_scaled_train \
  --name r4_scaled_train \
  --note "BASELINE config 4: canvas 100, rnn 512, vae-latent 100, batch 1024, anneal-iters 190 + hold 940 (reference 3000/15000-iteration schedule at b64 rescaled to the same pace in data seen); data: /root/data/scaled_100_data (max-digits 2, 29k/1k)"
echo "=== real+scaled queue done $(date) ==="
