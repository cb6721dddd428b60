#!/bin/bash
# Round-4 accuracy campaign (VERDICT r3 items #1, #2): one TPU process at a
# time (verify-skill rule), sequenced so the chip never idles.
#
#  1. finish the demo-checkpoint training: seg restored at 40 (copied from
#     exp_r3), rotation retrained with the continuous 6D head (the quat
#     regressor plateaued at 0.36 rad train — representation discontinuity),
#     keypoints from scratch; held-out benchmark -> trained_benchmark_r4.json
#  2. same checkpoints re-benchmarked through the int8 quantized conv ->
#     trained_benchmark_r4_int8.json (the <1% accuracy gate for flipping
#     the bench default to pallas-int8)
#  3. seg-backbone study (18D vs reference-default PLANES vs 14A):
#     train + held-out accuracy -> seg_backbone_study.json
set -e
cd "$(dirname "$0")/.."

POSE_EPOCHS=${POSE_EPOCHS:-24}
EE_MULT=${EE_MULT:-400}

mkdir -p exp_r4 results
if [ ! -e exp_r4/segmentation ] && [ -d exp_r3/segmentation ]; then
  cp -r exp_r3/segmentation exp_r4/segmentation   # restored at epoch 40
fi

echo "=== [1/3] campaign: rot-6d + keypoints + held-out benchmark (bf16)"
python scripts/train_demo_checkpoints.py --out exp_r4 \
  --samples 32 --epochs 40 --ee-mult "$EE_MULT" \
  --pose-epochs "$POSE_EPOCHS" --pose-batch 64 --kp-batch 32 --pose-lr 3e-4 \
  --rot-6d --confidence --backbone minkunet14A \
  --json-out results/trained_benchmark_r4.json

echo "=== [2/3] int8 accuracy delta (same checkpoints, quantized convs)"
python scripts/train_demo_checkpoints.py --out exp_r4 \
  --samples 32 --epochs 40 --ee-mult "$EE_MULT" \
  --pose-epochs "$POSE_EPOCHS" --pose-batch 64 --kp-batch 32 --pose-lr 3e-4 \
  --rot-6d --confidence --backbone minkunet14A \
  --bench-only --conv-impl pallas-int8 \
  --json-out results/trained_benchmark_r4_int8.json

echo "=== [3/3] seg-backbone study (18D vs default-PLANES 18 vs 14A)"
SEG_OUT=exp_r4 SEG_JSON=results/seg_backbone_study.json \
  python scripts/probe_seg_backbone.py

echo "=== campaign done"
