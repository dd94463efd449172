#!/bin/bash
# Round-3 step-cost experiments (VERDICT r2 #3): attack the ~0.35 ms
# batch-independent cost of the b64 fused step (weight/optimizer HBM
# traffic + small-op latency) with bf16 Adam-moment storage and scan
# unrolling. Honest slope timing (bench.slope_time). Sequential.
cd /root/repo
echo "=== bench r3: fp32 control $(date)"
timeout 1200 python bench.py --repeats 5 2>&1 | tail -2
echo "=== bench r3: bf16 adam moments"
timeout 1200 python bench.py --repeats 5 --adam-dtype bfloat16 2>&1 | tail -2
echo "=== bench r3: unroll 3"
timeout 1200 python bench.py --repeats 5 --unroll 3 2>&1 | tail -2
echo "=== bench r3: bf16 + unroll"
timeout 1200 python bench.py --repeats 5 --adam-dtype bfloat16 --unroll 3 2>&1 | tail -2
echo "=== bench r3: scaled config control"
timeout 1800 python bench.py --repeats 3 --config scaled --batch-size 1024 --multi-step 20 2>&1 | tail -2
echo "=== bench r3: scaled bf16+unroll"
timeout 1800 python bench.py --repeats 3 --config scaled --batch-size 1024 --multi-step 20 --adam-dtype bfloat16 --unroll 3 2>&1 | tail -2
echo "=== bench r3 done $(date)"
