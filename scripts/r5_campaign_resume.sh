#!/bin/bash
# Round-5 campaign, OOM-resume orchestration: the tunneled runtime leaks
# ~11 MB host RSS per dispatched train step (r5 discovery — the full
# 48-epoch rotation run crossed 128 GB at ~epoch 30 and was OOM-killed),
# so each long training phase runs as RESUME CHUNKS in fresh processes
# (checkpoint restore is the reference's own %09d/latest mechanism).
set -e
cd "$(dirname "$0")/.."

ZP=${ZP:-2.0}
ARGS="--out exp_r5 --samples 32 --epochs 40 --ee-mult 800
  --pose-batch 64 --kp-batch 32
  --pose-lr 3e-4 --rot-6d --confidence --backbone minkunet18
  --symmetry-loss --flip-disambiguation --z-percentile $ZP"

mkdir -p exp_r5 results

# rotation: resume 20 -> 30 -> 40 (seg restored at 40, kp untouched)
for PE in 30 40; do
  echo "=== rot chunk -> epoch $PE"
  python scripts/train_demo_checkpoints.py $ARGS \
    --pose-epochs $PE --kp-epochs 0 --skip-bench
done

# keypoints: 0 -> 8 -> 16 (rot restored at 40)
for KE in 8 16; do
  echo "=== kp chunk -> epoch $KE"
  python scripts/train_demo_checkpoints.py $ARGS \
    --pose-epochs 40 --kp-epochs $KE --skip-bench
done

echo "=== held-out benchmark (bf16, full levers)"
python scripts/train_demo_checkpoints.py $ARGS \
  --pose-epochs 40 --kp-epochs 16 --bench-only \
  --json-out results/trained_benchmark_r5.json

echo "=== int8 re-gate WITH percentile-z"
python scripts/train_demo_checkpoints.py $ARGS \
  --pose-epochs 40 --kp-epochs 16 --bench-only --conv-impl pallas-int8 \
  --json-out results/trained_benchmark_r5_int8.json

echo "=== campaign done"
