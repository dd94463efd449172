#!/bin/bash
# Round-4 raw-pixel rescue campaign (VERDICT r3 #2: close the union to
# 10/10 or characterize the residual). Sequential seed_sweep.py at the
# reference driver config (raw-pixel encoder, hold-15k), scale-prior
# curriculum + stall auto-restart + full schedule rotation — the r3
# rescue protocol (tag rescue_spc_rot) with two round-4 upgrades active:
#   - stall_spare_accuracy=0.85 + the slope fit (seed 6's best attempt
#     was abandoned at 0.889 by the PRE-fix policy, VERDICT r3)
#   - --attempt-stride: each campaign explores a FRESH derived-seed
#     attempt sequence (seed 8 resisted the default stride-1009 sequence
#     plus vmap policies — 5 attempts on record)
cd /root/repo

echo "=== seed 6 rescue (spare-accuracy fix active) $(date) ==="
timeout 5400 python scripts/seed_sweep.py 6 --data multi_mnist_data \
  --out sweep_r4_rescue --scale-prior-curriculum --stall-restart 60000 \
  --max-restarts 5 --tag rescue_spc_rot_r4 \
  > /tmp/r4_rescue_seed6.log 2>&1
tail -3 /tmp/r4_rescue_seed6.log

for stride in 2503 4007 7919; do
  echo "=== seed 8 rescue, attempt-stride $stride $(date) ==="
  timeout 5400 python scripts/seed_sweep.py 8 --data multi_mnist_data \
    --out sweep_r4_rescue --scale-prior-curriculum --stall-restart 60000 \
    --max-restarts 4 --attempt-stride "$stride" \
    --tag "rescue_spc_rot_stride${stride}" \
    > "/tmp/r4_rescue_seed8_s${stride}.log" 2>&1
  tail -3 "/tmp/r4_rescue_seed8_s${stride}.log"
done
echo "=== rescue campaign done $(date) ==="
