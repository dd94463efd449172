#!/bin/bash
# Round-4 second tail: a convergence-informative pipeline_unroll A/B
# (the first A/B's 20k-step budget ended inside the hold window — both
# arms still at ~0 accuracy by design of the hold-15k schedule), then
# the raw-pixel real-digits rescue pass, then the round-3 texture
# re-establishment runs ("old" segment).
cd /root/repo

echo "=== pipeline_unroll convergence A/B v2 (70k steps, stop 0.98) ==="
for pu in 1 4; do
  timeout 3600 python training.py --device-data \
    --train-data multi_mnist_data/common.airrec \
    --test-data multi_mnist_data/test.airrec \
    --results-folder "harder_runs/r4_pu${pu}_ab70k" --overwrite-results 1 \
    --steps 70000 --eval-every 2500 --img-every 1000000000 --grad-every 0 \
    --save-every 1000000000 --log-every 25000 --seed 0 \
    --stall-restart-step 0 --stop-at-accuracy 0.98 --pipeline-unroll "$pu" \
    > "/tmp/r4_pu${pu}_ab70k.log" 2>&1
  tail -3 "/tmp/r4_pu${pu}_ab70k.log"
  python scripts/ledger.py "harder_runs/r4_pu${pu}_ab70k" \
    --name "r4_pu${pu}_ab70k" \
    --note "pipeline_unroll=${pu} convergence A/B: robust default (CNN hold-15k), 70k-step budget, stop 0.98, seed 0, stall detection off"
done

echo "=== seed 8 patience arms (the untested policy) $(date) ==="
# Every prior seed-8 campaign used stall auto-restart: attempts are
# killed at ~60-70k if flat, which is biased against SLOW bootstrappers
# (round-1 seed 1 needed 250k steps on the reference schedule). Two
# single-attempt patience runs with the full reference-length budget:
timeout 5400 python scripts/seed_sweep.py 8 --data multi_mnist_data \
  --out sweep_r4_rescue --scale-prior-curriculum --stall-restart 0 \
  --max-iters 276000 --tag patience_spc \
  > /tmp/r4_s8_patience1.log 2>&1
tail -2 /tmp/r4_s8_patience1.log
timeout 5400 python scripts/seed_sweep.py 8 --data multi_mnist_data \
  --out sweep_r4_rescue --scale-prior-curriculum --stall-restart 0 \
  --max-iters 276000 --hold 30000 --temp-anneal --tag patience_spc_h30k_temp \
  > /tmp/r4_s8_patience2.log 2>&1
tail -2 /tmp/r4_s8_patience2.log

echo "=== raw-pixel real-digits rescue (open seeds, doubled budget) ==="
timeout 10800 python scripts/seed_sweep_vmap.py 0 2 3 5 6 8 9 \
  --scale-curriculum --data real_digits_data --out sweep_real \
  --max-restarts 6 --max-iters 250000 --post-restart-iters 120000 \
  --tag vmap_real_scalecur_rescue > /tmp/r4_real_raw_rescue.log 2>&1
tail -10 /tmp/r4_real_raw_rescue.log

bash scripts/run_bg_r4.sh old
echo "=== tail2 done $(date) ==="
