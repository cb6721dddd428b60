#!/bin/bash
# Round-5 accuracy campaign (VERDICT r4 items #2, #5, #7): ONE config for
# perf AND accuracy — train seg+rot+kp on the BENCH engine's backbone
# (minkunet18) with the symmetry-aware rotation loss, then benchmark with
# the exact bench levers (self-keyed k3, flip disambiguation,
# percentile-z) in bf16 AND int8.
#
# One TPU process at a time (verify-skill rule).
set -e
cd "$(dirname "$0")/.."

POSE_EPOCHS=${POSE_EPOCHS:-48}
EE_MULT=${EE_MULT:-800}
ZP=${ZP:-2.0}

ARGS="--out exp_r5 --samples 32 --epochs 40 --ee-mult $EE_MULT
  --pose-epochs $POSE_EPOCHS --kp-epochs 24 --pose-batch 64 --kp-batch 32
  --pose-lr 3e-4 --rot-6d --confidence --backbone minkunet18
  --symmetry-loss --flip-disambiguation --z-percentile $ZP"

mkdir -p exp_r5 results

echo "=== [1/2] r5 campaign: minkunet18 + symmetry loss + full levers (bf16)"
python scripts/train_demo_checkpoints.py $ARGS \
  --json-out results/trained_benchmark_r5.json

echo "=== [2/2] int8 re-gate WITH percentile-z (VERDICT r4 #5)"
python scripts/train_demo_checkpoints.py $ARGS \
  --bench-only --conv-impl pallas-int8 \
  --json-out results/trained_benchmark_r5_int8.json

echo "=== campaign done"
