#!/bin/bash
# Rotation-accuracy extension (after r4_campaign.sh): double the crop
# corpus (12.8k -> 25.6k; first 12.8k seeds identical, so the epoch-24
# checkpoint resumes on a superset) and continue the 6D head 24 -> 48
# epochs.  Keypoints restore at 24 untouched (--kp-epochs), segmentation
# at 40.  Ends with the held-out benchmark (bf16) -> _r4_ext.json, then
# the same checkpoints through int8 -> _r4_ext_int8.json (the final
# accuracy-gate pair).
set -e
cd "$(dirname "$0")/.."

ARGS="--out exp_r4 --samples 32 --epochs 40 --ee-mult 800
  --pose-epochs 48 --kp-epochs 24 --pose-batch 64 --kp-batch 32
  --pose-lr 3e-4 --rot-6d --confidence --backbone minkunet14A"

echo "=== rotation extension: 25.6k crops, epochs 24 -> 48 (bf16 bench)"
python scripts/train_demo_checkpoints.py $ARGS \
  --json-out results/trained_benchmark_r4_ext.json

echo "=== int8 re-gate on the extended checkpoints"
python scripts/train_demo_checkpoints.py $ARGS \
  --bench-only --conv-impl pallas-int8 \
  --json-out results/trained_benchmark_r4_ext_int8.json

echo "=== extension done"
