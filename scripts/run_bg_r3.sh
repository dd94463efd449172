#!/bin/bash
# Round-3 harder-scenes campaign (VERDICT r2 #1): the data-initialized
# learned background at the open intensities (0.6, 1.0), then the
# reference's REAL background textures at their natural 1.0 dimmer.
# Strictly sequential — one CPU core, one TPU; run nothing else alongside.
cd /root/repo

run_one () {
  local name=$1 data=$2 extra=$3
  echo "=== r3 run: $name $(date) ==="
  timeout 7200 python training.py \
    --train-data "$data/common.airrec" --test-data "$data/test.airrec" \
    --results-folder "harder_runs/$name" --overwrite-results 1 \
    --max-steps 5 --max-digits 3 --device-data \
    --eval-every 2500 --img-every 1000000000 --grad-every 0 \
    --save-every 1000000000 --log-every 25000 \
    --stop-at-accuracy 0.98 --anneal-hold 15000 --steps 120000 \
    --learn-background $extra 2>&1 | tail -8
}

case "${1:-main}" in
  main)
    # the round-2 open boundary, with the data-driven background init
    run_one r3_bg0.6_init_cnn  harder_bg0.6_data  ""
    run_one r3_bg1.0_init_cnn  harder_bg1.0_data  ""
    run_one r3_bg0.6_init_mlp  harder_bg0.6_data  "--no-cnn"
    ;;
  ref)
    # the reference's real textures (backgrounds/ PNGs) at dimmer 1.0
    for T in gray1 gray2 portrait1 pattern2; do
      run_one "r3_ref_${T}_cnn" "harder_ref_${T}_data" ""
    done
    ;;
  control)
    # control: data-init at the already-solved 0.3 (convergence speedup?)
    run_one r3_bg0.3_init_cnn  harder_bg0.3_data  ""
    ;;
esac
echo "=== r3 campaign segment done $(date) ==="
