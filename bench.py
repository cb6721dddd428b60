"""Headline benchmark: clouds/sec/chip for the full calibration pipeline.

Measures the fused InferenceEngine path — color normalisation, voxelize,
MinkUNet18D segmentation, largest-cluster filter, EE crop, rotation net,
magic translation, keypoint net, Kabsch, 2x ICP — on synthetic sample
scenes (the reference's sample pickles are LFS-missing; see
mrcc_tpu/data/synthetic.py), batched through one jit program.

Prints ONE JSON line:
  {"metric": "clouds_per_sec_per_chip", "value": N, "unit": "clouds/s",
   "vs_baseline": N / 2000.0}

``vs_baseline`` is against the driver-set north star of 2000 clouds/s/chip
(BASELINE.json; the reference app itself runs ~1.25 FPS end-to-end on
GPU+CPU, app/main.py:456).
"""

import json
import os
import sys
import time

import numpy as np


def build_inputs(batch, capacity, seed=0):
    from mrcc_tpu.data.synthetic import generate_sample

    pts = np.zeros((batch, capacity, 3), np.float32)
    rgb = np.zeros((batch, capacity, 3), np.float32)
    mask = np.zeros((batch, capacity), bool)
    for i in range(batch):
        s = generate_sample(seed=seed + i, n_ee=2048, n_arm=3000, n_bg=7000)
        n = min(len(s["points"]), capacity)
        pts[i, :n] = s["points"][:n]
        rgb[i, :n] = s["rgb"][:n]
        mask[i, :n] = True
    return pts, rgb, mask


def main():
    import jax

    from mrcc_tpu.app import InferenceConfig, InferenceEngine

    on_tpu = jax.devices()[0].platform != "cpu"
    batch = int(os.environ.get("BENCH_BATCH", 8 if on_tpu else 2))
    iters = int(os.environ.get("BENCH_ITERS", 10 if on_tpu else 2))
    capacity = int(os.environ.get("BENCH_POINTS", 16384))

    cfg = InferenceConfig(
        point_capacity=capacity,
        seg_voxel_capacity=6144,
        ee_point_capacity=2048,
        ee_voxel_capacity=2048,
        kp_voxel_capacity=2048,
        icp_iterations=15,
        icp_template_points=1024,
    )
    engine = InferenceEngine(cfg, seed=0)

    pts, rgb, mask = build_inputs(batch, capacity)

    # compile + warmup; completion is forced with a real host transfer —
    # block_until_ready alone does NOT wait on some remote backends
    # (measured: an impossible 6440 TFLOP/s without the device_get)
    out = engine.predict_batch_arrays(pts, rgb, mask)
    jax.device_get(out["ee_pose"])

    t0 = time.perf_counter()
    for _ in range(iters):
        out = engine.predict_batch_arrays(pts, rgb, mask)
    jax.device_get(out["ee_pose"])  # device executes serially: this waits
    dt = time.perf_counter() - t0   # for every queued iteration

    clouds_per_sec = batch * iters / dt
    result = {
        "metric": "clouds_per_sec_per_chip",
        "value": round(clouds_per_sec, 3),
        "unit": "clouds/s",
        "vs_baseline": round(clouds_per_sec / 2000.0, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
