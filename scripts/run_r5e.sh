#!/bin/bash
# band240k stage, part 2: the run_r5d.sh runs were silently bounded by
# the reference-parity default --epochs 300 (300 epochs x 453
# steps/epoch = 135,900 < the requested 240k cap). Rather than rerun
# from scratch, resume each finished run from its final checkpoint
# (exact-resume contract, trainer.py:740) with the epoch bound lifted
# (--epochs 530 = 240,090 steps headroom) and the same model/schedule
# flags, then regenerate + commit the ledger over the appended
# trajectory.
cd /root/repo

resume_to_240k () {
  local name=$1 data=$2
  echo "=== band240k resume: $name $(date) ==="
  timeout 3600 python training.py \
    --train-data "$data/common.airrec" --test-data "$data/test.airrec" \
    --results-folder "harder_runs/$name" \
    --max-steps 5 --max-digits 3 --device-data \
    --eval-every 2500 --img-every 1000000000 --grad-every 0 \
    --save-every 1000000000 --log-every 25000 \
    --stop-at-accuracy 0.98 --anneal-hold 15000 \
    --steps 240000 --epochs 530 \
    --learn-background --bg-init data 2>&1 | tail -4
  python scripts/ledger.py "harder_runs/$name" --name "$name" \
    --note "training.py --max-steps 5 --max-digits 3 --anneal-hold 15000 \
--stop-at-accuracy 0.98 --steps 240000 --epochs 530 --learn-background \
--bg-init data (resumed from the epoch-300 bound at 135,900); data: \
generate_multi_mnist.py --max-digits 3 --images-per-digit 10000 \
--test-set-size 1000 ($data)"
  git add "harder_runs/ledgers/${name}.json"
  git commit -q -m "band240k ledger (resumed to 240k cap): $name" || true
}

resume_to_240k r5_ref_pattern2_cnn_240k harder_ref_pattern2_data
resume_to_240k r5_ref_portrait2_cnn_240k harder_ref_portrait2_data
resume_to_240k r5_ref_abstract2_cnn_240k harder_ref_abstract2_data
echo "=== band240k resume done $(date) ==="
