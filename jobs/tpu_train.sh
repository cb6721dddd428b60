#!/bin/bash
# TPU training launcher (the reference uses SLURM V100 jobs, jobs/job1_v100.sh;
# on TPU VMs run directly — data parallelism scales over local chips via
# mrcc_tpu.parallel without any scheduler flags).
set -e
cd "$(dirname "$0")/.."
CONFIG=${1:-mrcc_tpu/config/default.yaml}
shift || true
python3 train_segmentation.py --config "$CONFIG" "$@"
