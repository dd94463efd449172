#!/bin/bash
# Round-4 tail queue: harder-scenes campaign with durable ledgers
# (VERDICT r3 #5/#6), then the pipeline_unroll measurements (#4).
cd /root/repo

bash scripts/run_bg_r4.sh holes
bash scripts/run_bg_r4.sh rerun

echo "=== pipeline_unroll bench rows $(date) ==="
for pu in 1 2 4; do
  echo "--- pipeline-unroll $pu ---"
  timeout 1800 python bench.py --pipeline-unroll "$pu" \
    > "/tmp/r4_bench_pu${pu}.log" 2>&1
  tail -1 "/tmp/r4_bench_pu${pu}.log"
done

echo "=== pipeline_unroll convergence A/B (20k steps, robust default) ==="
for pu in 1 2; do
  timeout 3600 python training.py --device-data \
    --train-data multi_mnist_data/common.airrec \
    --test-data multi_mnist_data/test.airrec \
    --results-folder "harder_runs/r4_pu${pu}_ab" --overwrite-results 1 \
    --steps 20000 --eval-every 2500 --img-every 1000000000 --grad-every 0 \
    --save-every 1000000000 --log-every 10000 --seed 0 \
    --stall-restart-step 0 --pipeline-unroll "$pu" \
    > "/tmp/r4_pu${pu}_ab.log" 2>&1
  tail -4 "/tmp/r4_pu${pu}_ab.log"
  python scripts/ledger.py "harder_runs/r4_pu${pu}_ab" --name "r4_pu${pu}_ab" \
    --note "pipeline_unroll=${pu} convergence A/B: robust default (CNN, hold-15k), 20k steps, seed 0, stall detection off (mirrors the round-3 scan-unroll protocol)"
done
echo "=== tail queue done $(date) ==="
