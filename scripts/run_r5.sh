#!/bin/bash
# Round-5 evidence campaigns (VERDICT r4 tasks 1-8), strictly sequential
# on the one chip. Each stage is also runnable alone: run_r5.sh <stage>.
#   bf16c    — leg-2 clean bf16c 10-seed CNN sweep (task 1a/3)
#   grid     — one-session throughput grid, b64 + scaled b1024 (task 4)
#   sweeps   — pu4 / stepparallel / combined sp+bf16c 10-seed CNN sweeps (task 3)
#   real     — raw-pixel-on-real remedies for seeds 2/3/8 (task 2):
#              S=3 re-roll, hold-30k + slower decay, bicubic data arm
#   harder   — abstract1 frozen-background oracle (task 5) +
#              240k-cap runs for pattern2/portrait2/abstract2 (task 6)
#   serve    — real-handwriting checkpoint + demo/embeddings evidence +
#              stepparallel end-to-end harder-scenes training smoke (task 8)
cd /root/repo

sweep () { timeout 10800 python scripts/seed_sweep_vmap.py "$@"; }

run_harder () {
  local name=$1 data=$2 steps=$3; shift 3
  timeout 14400 python training.py \
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
data: $data"
}

case "${1:-all}" in
  bf16c)
    sweep 0 1 2 3 4 5 6 7 8 9 --cnn --compute-dtype bfloat16 --rotate 0
    ;;
  grid)
    OUT=harder_runs/bench_r5_grid.jsonl; : > $OUT
    row () { timeout 1200 python bench.py "$@" | tail -1 >> $OUT; }
    row
    row --decoder-layout stepparallel
    row --pipeline-unroll 4
    row --decoder-layout stepparallel --pipeline-unroll 4
    row --decoder-layout stepparallel --pipeline-unroll 4 --compute-dtype bfloat16
    for extra in "" "--compute-dtype bfloat16" "--pipeline-unroll 4" \
        "--pipeline-unroll 4 --compute-dtype bfloat16" \
        "--decoder-layout stepparallel" \
        "--decoder-layout stepparallel --compute-dtype bfloat16" \
        "--decoder-layout stepparallel --pipeline-unroll 4 --compute-dtype bfloat16"; do
      row --config scaled --batch-size 1024 --multi-step 20 $extra
    done
    ;;
  sweeps)
    # hoisted-gate-projection bench rows first (grid addendum): decides
    # whether hx joins the fast-path default candidate
    row () { timeout 1200 python bench.py "$@" | tail -1 >> harder_runs/bench_r5_grid.jsonl; }
    row --rnn-input-hoist
    row --decoder-layout stepparallel --rnn-input-hoist
    row --decoder-layout stepparallel --compute-dtype bfloat16
    row --decoder-layout stepparallel --compute-dtype bfloat16 --rnn-input-hoist
    row --config scaled --batch-size 1024 --multi-step 20 --rnn-input-hoist
    row --config scaled --batch-size 1024 --multi-step 20 \
      --compute-dtype bfloat16 --rnn-input-hoist
    row --config scaled --batch-size 1024 --multi-step 20 \
      --decoder-layout stepparallel --compute-dtype bfloat16 --rnn-input-hoist
    # convergence sweeps, default-candidate first (the full fast path),
    # then single-knob attribution, then the judge-requested pu4 arm
    # (split into S=5 halves: the S=10 x 4-way-unrolled program crashed
    # at step 0 on the chip with no diagnostic; halving S halves live
    # buffers and compile)
    sweep 0 1 2 3 4 5 6 7 8 9 --cnn --decoder-layout stepparallel \
      --compute-dtype bfloat16 --rnn-input-hoist --rotate 0
    sweep 0 1 2 3 4 5 6 7 8 9 --cnn --decoder-layout stepparallel --rotate 0
    sweep 0 1 2 3 4 5 6 7 8 9 --cnn --decoder-layout stepparallel \
      --compute-dtype bfloat16 --rotate 0
    sweep 0 1 2 3 4 --cnn --pipeline-unroll 4 --rotate 0
    sweep 5 6 7 8 9 --cnn --pipeline-unroll 4 --rotate 0
    ;;
  real)
    sweep 2 3 8 --scale-curriculum --data real_digits_data --out sweep_real \
      --max-restarts 6 --max-iters 250000 --post-restart-iters 120000 \
      --tag vmap_real_scalecur_reroll3
    sweep 2 3 8 --scale-curriculum --hold 30000 --anneal-iters 6000 \
      --data real_digits_data --out sweep_real \
      --max-restarts 6 --max-iters 250000 --post-restart-iters 120000 \
      --tag vmap_real_scalecur_h30k
    python scripts/generate_multi_mnist.py --source sklearn \
      --upsample bicubic --out-folder real_digits_bicubic_data
    sweep 0 1 2 3 4 5 6 7 8 9 --scale-curriculum \
      --data real_digits_bicubic_data --out sweep_real \
      --tag vmap_real_scalecur_bicubic
    ;;
  harder)
    run_harder r5_ref_abstract1_oracle harder_ref_abstract1_data 120000 --bg-freeze
    run_harder r5_ref_pattern2_cnn_240k harder_ref_pattern2_data 240000
    run_harder r5_ref_portrait2_cnn_240k harder_ref_portrait2_data 240000
    run_harder r5_ref_abstract2_cnn_240k harder_ref_abstract2_data 240000
    ;;
  serve)
    timeout 7200 python training.py \
      --train-data real_digits_data/common.airrec \
      --test-data real_digits_data/test.airrec \
      --results-folder harder_runs/r5_real_ckpt --overwrite-results 1 \
      --device-data --eval-every 2500 --img-every 1000000000 \
      --grad-every 0 --save-every 10000 --log-every 25000 \
      --stop-at-accuracy 0.98 --anneal-hold 15000 --steps 120000
    python scripts/ledger.py harder_runs/r5_real_ckpt --name r5_real_ckpt \
      --note "robust-default CNN on real_digits_data (serving-tools evidence)"
    timeout 1200 python demo.py --model-path harder_runs/r5_real_ckpt/models \
      --headless 40 > /tmp/r5_demo_real.jsonl
    timeout 1800 python embeddings.py \
      --model-path harder_runs/r5_real_ckpt/models \
      --test-data real_digits_data/test.airrec \
      --results-folder harder_runs/r5_real_ckpt
    run_harder r5_bg0.6_sp harder_bg0.6_data 120000 --decoder-layout stepparallel
    ;;
esac
