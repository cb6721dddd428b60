"""Per-stage engine timing on the real chip (queued-dispatch, host-synced).

Breaks the pipeline into separately-jitted pieces to locate the wall:
voxelize / hierarchy / U-Net apply / cluster / crop for the seg stage, plus
the whole pose / kp / icp stages. Prints a table + implied clouds/s.

Run alone on the TPU: python scripts/bench_stages.py
Env: BENCH_BATCH (8), BENCH_POINTS (16384), CONV_IMPL (auto)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, args, iters=10):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters, out


def main():
    from bench import build_inputs

    from mrcc_tpu.app import InferenceConfig, InferenceEngine
    from mrcc_tpu.solve import largest_cluster_mask
    from mrcc_tpu.sparse import build_hierarchy, slice_to_points, voxelize
    from mrcc_tpu.sparse.conv import conv_impl

    batch = int(os.environ.get("BENCH_BATCH", 8))
    capacity = int(os.environ.get("BENCH_POINTS", 16384))
    impl = os.environ.get("CONV_IMPL", "auto")

    from bench import measure_seg_caps

    pts0, rgb0, mask0 = build_inputs(batch, capacity)
    seg_caps = measure_seg_caps(pts0, rgb0, mask0)
    print(f"# seg caps {seg_caps}")
    cfg = InferenceConfig(
        point_capacity=capacity, seg_voxel_capacity=seg_caps[0],
        seg_hierarchy_caps=seg_caps[1:],
        ee_point_capacity=2048, ee_voxel_capacity=2048,
        kp_voxel_capacity=1024,
        ee_hierarchy_caps=(1024, 384, 128, 128),
        kp_hierarchy_caps=(768, 640, 384, 128),
        icp_iterations=15, icp_template_points=1024,
        conv_impl=impl)
    engine = InferenceEngine(cfg, seed=0)
    print(f"# conv_impl={engine._conv_impl} B={batch} P={capacity}")

    pts, rgb, mask = build_inputs(batch, capacity)
    pts, rgb, mask = jnp.asarray(pts), jnp.asarray(rgb), jnp.asarray(mask)

    rows = []

    # ---- seg-stage sub-pieces
    caps = engine._hierarchy_caps(cfg.seg_voxel_capacity,
                                  cfg.seg_hierarchy_caps)

    caps_all = (cfg.seg_voxel_capacity,) + tuple(cfg.seg_hierarchy_caps)

    @jax.jit
    def f_vox(pts, rgb, mask):
        return voxelize(pts, rgb, mask, 1 / cfg.seg_scale,
                        cfg.seg_voxel_capacity)

    dt, (vox, pv, _) = timeit(f_vox, (pts, rgb, mask))
    rows.append(("voxelize(seg)", dt))

    from mrcc_tpu.sparse.impl import sparse_impl

    def f_hier2(vox):
        with sparse_impl(engine._conv_impl):
            return build_hierarchy(vox, 4, capacities=caps)

    f_hier2 = jax.jit(f_hier2)

    dt, levels = timeit(f_hier2, (vox,))
    rows.append(("hierarchy(seg)", dt))

    def f_unet(params, feats, levels):
        with conv_impl(engine._conv_impl):
            return engine._seg_model.apply(
                params, feats.astype(jnp.bfloat16), levels)

    f_unet = jax.jit(f_unet)
    dt, logits = timeit(f_unet, (engine.params["segmentation"], vox.feats,
                                 levels))
    rows.append(("18D U-Net apply", dt))

    @jax.jit
    def f_cluster(points, seg_mask):
        from mrcc_tpu.app.inference_engine import cluster_capacity
        return jax.vmap(partial(largest_cluster_mask, dist=cfg.cluster_dist,
                                capacity=cluster_capacity(cfg)))(points,
                                                                 seg_mask)

    seg_mask = mask & (jnp.arange(capacity)[None] % 3 == 0)
    dt, _ = timeit(f_cluster, (pts, seg_mask))
    rows.append(("cluster(exact)", dt))

    # ---- whole stages
    dt, seg_out = timeit(engine._seg_jit,
                         (engine.params["segmentation"], pts, rgb, mask))
    rows.append(("STAGE seg total", dt))
    _, _, ee_pts, ee_rgb, ee_valid, _ = seg_out

    dt, pose_out = timeit(engine._pose_jit,
                          (engine.params["rotation"], ee_pts, ee_rgb,
                           ee_valid))
    rows.append(("STAGE pose total", dt))
    ee_pose, _ = pose_out

    dt, kp_out = timeit(engine._kp_jit, (engine.params["key_points"], ee_pts,
                                         ee_rgb, ee_valid))
    rows.append(("STAGE kp total", dt))

    dt, _ = timeit(engine._icp_jit, (engine.template, ee_pts, ee_valid,
                                     ee_pose, kp_out[0]))
    rows.append(("STAGE icp total", dt))

    def full(pts, rgb, mask):
        return engine.predict_batch_arrays(pts, rgb, mask)

    dt, _ = timeit(full, (pts, rgb, mask))
    rows.append(("FULL pipeline", dt))

    print(f"{'piece':24s} {'ms':>9s} {'clouds/s':>9s}")
    for name, dt in rows:
        print(f"{name:24s} {dt*1e3:9.2f} {batch/dt:9.1f}")


if __name__ == "__main__":
    main()
