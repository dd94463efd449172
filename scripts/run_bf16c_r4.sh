#!/bin/bash
# Round-4 mixed-precision evidence queue (runs after the bf16-compute
# bench rows, /tmp/run_bench_bf16c.sh):
#   1. 10-seed CNN robust-default convergence sweep under
#      compute_dtype=bfloat16 on the standard synthetic set — the
#      convergence half of the evidence for the round-4 mixed-precision
#      knob (the fp32 control is the committed 10/10 union,
#      sweep_vmap/results.jsonl tag vmap_hold15000_cnn).
#   2. Raw-pixel-on-real S=1 re-rolls for the four open seeds
#      (s2,s3,s6,s8 ended in the 0.67 basin after 6 restarts inside
#      S=7/S=10 vmap programs). S=1 compiles a different fused program;
#      per the round-3 unroll attribution its numerics re-roll the
#      knife-edge bootstrap lottery — exactly how CNN seed 8 closed
#      (RESULTS.md, tag vmap_real_cnn_rescue8).
cd /root/repo

wait_for_pid() {
  local pidfile=$1
  [ -f "$pidfile" ] || return 0
  local pid=$(cat "$pidfile")
  while kill -0 "$pid" 2>/dev/null; do sleep 30; done
}

wait_for_pid /tmp/r4_bench_bf16c.pid

echo "=== 1. bf16-compute 10-seed CNN convergence sweep $(date) ==="
timeout 10800 python scripts/seed_sweep_vmap.py 0 1 2 3 4 5 6 7 8 9 \
  --cnn --compute-dtype bfloat16 --data multi_mnist_data \
  --out sweep_vmap > /tmp/r4_bf16c_sweep.log 2>&1
tail -12 /tmp/r4_bf16c_sweep.log

echo "=== 2. raw-pixel real-digits S=1 re-rolls (seeds 2 3 6 8) $(date) ==="
for s in 2 3 6 8; do
  timeout 7200 python scripts/seed_sweep_vmap.py $s \
    --scale-curriculum --data real_digits_data --out sweep_real \
    --max-restarts 6 --max-iters 250000 --post-restart-iters 120000 \
    --tag vmap_real_scalecur_reroll > /tmp/r4_real_reroll_s$s.log 2>&1
  tail -2 /tmp/r4_real_reroll_s$s.log
done
echo "=== bf16c queue done $(date) ==="
