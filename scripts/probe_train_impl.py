"""Train-step timing: XLA gather path vs Pallas kernel path (fwd + VJP).

VERDICT r3 item #3: the custom-VJP conv kernels (ops/conv_pallas.py:787-1002)
must carry the actual training workload (reference hot loop
/root/reference/train.py:39-151), not only inference.  This probe times the
FULL jitted train step (voxelize -> hierarchy -> model fwd -> loss -> grad
-> adamw update) under both sparse-conv impls, at:

  - the flagship bench shape: segmentation, minkunet (18D), B=8 @ 16k pts
  - the campaign shapes:      segmentation 14A B=8 @ 16k,
                              rotation 14A B=64 @ 4096 (EE crops),
                              keypoints 14A B=32 @ 4096

Run ALONE on the TPU (one process per chip).  Prints ms/step per (task,
impl) + the speedup ratio.  Env: PROBE_TASKS (csv subset), PROBE_ITERS.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, args, iters=6):
    out = fn(*args)
    import jax

    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    import mrcc_tpu
    from mrcc_tpu.data import AliveV2Dataset, DataConfig
    from mrcc_tpu.data.synthetic import generate_sample
    from mrcc_tpu.models import RobotNetEncode, RobotNetSegmentation
    from mrcc_tpu.train import (LossConfig, LossType, TrainConfig, Trainer,
                                make_pose_train_step,
                                make_segmentation_train_step)

    mrcc_tpu.enable_compilation_cache()
    iters = int(os.environ.get("PROBE_ITERS", 6))
    only = os.environ.get("PROBE_TASKS")
    only = set(only.split(",")) if only else None

    # data (host-side, jax-free)
    scenes = [generate_sample(seed=1000 + i, n_ee=2048, n_arm=3000,
                              n_bg=7000) for i in range(8)]
    crops = [generate_sample(seed=20000 + i, n_ee=2048, n_arm=96, n_bg=96)
             for i in range(64)]

    seg_cfg = DataConfig(data_type=None, max_points=16384, scale=200,
                         center_at_origin=True)
    ee_cfg = DataConfig(data_type="ee_seg", max_points=4096, scale=200,
                        center_at_origin=True)
    kp_cfg = DataConfig(data_type="ee_seg", max_points=4096, scale=800,
                        center_at_origin=True, keypoints_enabled=True,
                        num_of_keypoints=6)

    def seg_batch(cfg, n):
        ds = AliveV2Dataset(samples=scenes[:n], cfg=cfg)
        return ds, {k: v for k, v in
                    ds.collate([ds[i] for i in range(n)]).items()
                    if k != "others"}

    def crop_batch(cfg, n):
        ds = AliveV2Dataset(samples=crops[:n], cfg=cfg)
        return ds, {k: v for k, v in
                    ds.collate([ds[i] for i in range(n)]).items()
                    if k != "others"}

    # campaign shapes first — a failing flagship row must not block them
    tasks = []
    if only is None or "rot" in only:
        tasks.append(("rot14A B=64/4k cap2048", "pose",
                      RobotNetEncode(backbone="minkunet14A", in_channels=3,
                                     out_channels=10, rot_dims=4),
                      ee_cfg, crop_batch(ee_cfg, 64), 2048, 64))
    if only is None or "kp" in only:
        tasks.append(("kp14A B=32/4k cap4096", "seg",
                      RobotNetSegmentation(backbone="minkunet14A",
                                           in_channels=3, num_classes=6),
                      kp_cfg, crop_batch(kp_cfg, 32), 4096, 32))
    if only is None or "seg14" in only:
        tasks.append(("seg14A B=8/16k cap8192", "seg",
                      RobotNetSegmentation(backbone="minkunet14A",
                                           in_channels=3, num_classes=3),
                      seg_cfg, seg_batch(seg_cfg, 8), 8192, 8))
    # 18D at B=8/16k OOMs 16G HBM in the backward (f32 [8,12288,384] temps)
    # even at B=4; remat=True checkpoints the residual blocks so the
    # flagship trains on one chip
    if only is None or "seg18" in only:
        tasks.append(("seg18r B=8/16k cap12288", "seg",
                      RobotNetSegmentation(backbone="minkunet",
                                           in_channels=3, num_classes=3,
                                           remat=True),
                      seg_cfg, seg_batch(seg_cfg, 8), 12288, 8))

    print(f"devices: {jax.devices()}  iters={iters}", flush=True)
    print(f"{'task':26s} {'impl':7s} {'ms/step':>9s} {'items/s':>9s}")
    results = {}
    for name, kind, model, dcfg, (ds, batch), cap, bsz in tasks:
      try:
        for impl in ("xla", "pallas"):
            tc = TrainConfig(lr=1e-3, batch_size=bsz, epochs=1,
                             conv_impl=impl)
            if kind == "seg":
                step, opt = make_segmentation_train_step(
                    model, dcfg, tc, voxel_capacity=cap)
            else:
                step, opt = make_pose_train_step(
                    model, dcfg,
                    LossConfig(loss_type=LossType.COS2,
                               compute_confidence=True), tc,
                    voxel_capacity=cap)
            tr = Trainer(model, ds, step, opt, tc,
                         exp_path="/tmp/probe_train_impl", exp_name="p",
                         init_batch=ds.collate([ds[0]]))
            state = tr.state

            def run(state, batch):
                s, m = step(state, batch, 1e-3)
                return m["loss"]

            t0 = time.perf_counter()
            dt = timeit(run, (state, batch), iters=iters)
            compile_s = time.perf_counter() - t0 - dt * iters
            results[(name, impl)] = dt
            print(f"{name:26s} {impl:7s} {dt*1e3:9.2f} {bsz/dt:9.1f}"
                  f"   (compile ~{compile_s:.0f}s)", flush=True)
        r = results[(name, "xla")] / results[(name, "pallas")]
        print(f"{name:26s} pallas speedup vs xla: {r:.2f}x", flush=True)
      except Exception as e:  # noqa: BLE001 — one OOM must not kill the probe
        print(f"{name:26s} FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    main()
