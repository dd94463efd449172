#!/bin/bash
# Round-4 harder-scenes campaign (VERDICT r3 missing #4/#5): re-establish the
# round-3 headline configurations with DURABLE committed ledgers
# (harder_runs/ledgers/*.json via scripts/ledger.py — the round-3 run folders
# were lost to round recycling), fill the two table holes (bg-1.0 raw-pixel;
# more of the reference's 19 textures), and re-record the robust-default
# convergence run whose prior citation was a /tmp path.
# Strictly sequential — one CPU core, one TPU; run nothing else alongside.
#   gen    — (CPU) regenerate the harder datasets (gitignored, reproducible)
#   holes  — bg-1.0 raw-pixel + the 4 NEW reference textures
#   rerun  — bg-0.6 / bg-1.0 CNN re-runs + robust-default convergence
#   old    — the 4 round-3 textures (stretch: re-establish the r3 table rows)
cd /root/repo

gen_one () {
  local name=$1; shift
  echo "=== gen: $name $(date) ==="
  timeout 1800 python scripts/generate_multi_mnist.py \
    --max-digits 3 --images-per-digit 10000 --test-set-size 1000 \
    --out-folder "$name" "$@" 2>&1 | tail -1
}

run_one () {
  local name=$1 data=$2; shift 2
  echo "=== r4 run: $name $(date) ==="
  timeout 7200 python training.py \
    --train-data "$data/common.airrec" --test-data "$data/test.airrec" \
    --results-folder "harder_runs/$name" --overwrite-results 1 \
    --max-steps 5 --max-digits 3 --device-data \
    --eval-every 2500 --img-every 1000000000 --grad-every 0 \
    --save-every 1000000000 --log-every 25000 \
    --stop-at-accuracy 0.98 --anneal-hold 15000 --steps 120000 \
    --learn-background --bg-init data "$@" 2>&1 | tail -6
  python scripts/ledger.py "harder_runs/$name" --name "$name" \
    --note "training.py --max-steps 5 --max-digits 3 --anneal-hold 15000 \
--stop-at-accuracy 0.98 --steps 120000 --learn-background --bg-init data $*; \
data: generate_multi_mnist.py --max-digits 3 --images-per-digit 10000 \
--test-set-size 1000 ($data)"
}

case "${1:-gen}" in
  gen)
    gen_one harder_bg0.6_data --bg-kind noise --bg-max-intensity 0.6
    gen_one harder_bg1.0_data --bg-kind noise --bg-max-intensity 1.0
    for T in blob1 abstract1 pattern1 pattern3; do
      gen_one "harder_ref_${T}_data" \
        --bg-path "/root/reference/backgrounds/${T}.png" --bg-max-intensity 1.0
    done
    ;;
  holes)
    run_one r4_bg1.0_init_mlp harder_bg1.0_data --no-cnn
    for T in blob1 abstract1 pattern1 pattern3; do
      run_one "r4_ref_${T}_cnn" "harder_ref_${T}_data"
    done
    ;;
  rerun)
    run_one r4_bg0.6_init_cnn harder_bg0.6_data
    run_one r4_bg1.0_init_cnn harder_bg1.0_data
    ;;
  old)
    for T in gray1 gray2 portrait1 pattern2; do
      gen_one "harder_ref_${T}_data" \
        --bg-path "/root/reference/backgrounds/${T}.png" --bg-max-intensity 1.0
      run_one "r4_ref_${T}_cnn" "harder_ref_${T}_data"
    done
    ;;
  rest19)
    # The remaining 11 of the reference's 19 shipped textures, in
    # information-ceiling rank order (scripts/texture_contrast.py: best
    # surviving ink contrast first) so a budget cut leaves a clean prefix
    # of the 19/19 predicted-vs-measured map.
    for T in portrait2 blob2 gray3 abstract3 portrait4 blob3 blob4 \
             portrait3 abstract2 pattern4 pattern5; do
      gen_one "harder_ref_${T}_data" \
        --bg-path "/root/reference/backgrounds/${T}.png" --bg-max-intensity 1.0
      run_one "r4_ref_${T}_cnn" "harder_ref_${T}_data"
      rm -rf "harder_ref_${T}_data"   # ~60 MB each; regenerable, keep disk flat
    done
    ;;
esac
echo "=== r4 campaign segment ${1:-gen} done $(date) ==="
