#!/bin/bash
# Robustness campaign phase 2 (chained behind the harder-scenes campaign,
# pid $1):
#   A. Probe the CNN-encoder config (reference CONSTRUCTOR default) on the
#      three hardest seeds of the first pass.
#   B. If all probes converge, complete the full 10-seed table at the CNN
#      config; otherwise fall back to deep (5-restart, data-order
#      decorrelated) re-runs of the failed seeds at the cnn=False config.
cd /root/repo
WAIT_PID=${1:-0}
if [ "$WAIT_PID" != "0" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
echo "=== phase A: cnn=True probes $(date) ==="
for s in 1 5 8; do
  echo "--- cnn probe seed $s $(date) ---"
  timeout 7200 python scripts/seed_sweep.py "$s" \
    --data multi_mnist_data --out sweep_r2 --cnn \
    --hold 15000 --stall-restart 60000 --max-restarts 3 \
    --max-iters 150000 --stop-acc 0.98 2>&1 | tail -3
done

A_OK=$(python - <<'EOF'
import json
conv = {}
for line in open("sweep_r2/results.jsonl"):
    r = json.loads(line)
    if "cnn" in r["tag"]:
        conv[r["seed"]] = r["converged"]
print(int(all(conv.get(s) for s in (1, 5, 8))))
EOF
)
echo "=== probes all converged: $A_OK ==="

if [ "$A_OK" = "1" ]; then
  echo "=== phase B: complete the 10-seed CNN table $(date) ==="
  for s in 0 2 3 4 6 7 9; do
    echo "--- cnn seed $s $(date) ---"
    timeout 7200 python scripts/seed_sweep.py "$s" \
      --data multi_mnist_data --out sweep_r2 --cnn \
      --hold 15000 --stall-restart 60000 --max-restarts 3 \
      --max-iters 150000 --stop-acc 0.98 2>&1 | tail -3
  done
else
  echo "=== phase B: deep cnn=False re-runs of failed seeds $(date) ==="
  for s in 1 5 6 8 9; do
    echo "--- re-run seed $s $(date) ---"
    timeout 7200 python scripts/seed_sweep.py "$s" \
      --data multi_mnist_data --out sweep_r2 \
      --hold 15000 --stall-restart 60000 --max-restarts 5 \
      --max-iters 250000 --stop-acc 0.98 2>&1 | tail -3
  done
fi
echo "=== reruns campaign done $(date) ==="
