"""Production-profile engine stage breakdown (B=2/131k, bench.py config).

Times the engine's OWN stage jits (calibrated int8 when BENCH_IMPL says
so) — the exact programs the headline/production bench measures — to
locate the production wall.  Also decomposes the seg stage (voxelize /
hierarchy / U-Net / cluster / crop) under the same engine config.

Run alone on the TPU:
  BENCH_POINTS=131072 BENCH_BATCH=2 BENCH_IMPL=pallas-int8 \
      python scripts/probe_prod_stages.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, args, iters=8):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters, out


def main():
    from bench import build_inputs, measure_seg_caps
    from mrcc_tpu.app import InferenceConfig, InferenceEngine

    batch = int(os.environ.get("BENCH_BATCH", 2))
    capacity = int(os.environ.get("BENCH_POINTS", 131072))
    impl = os.environ.get("BENCH_IMPL", "pallas-int8")

    pts, rgb, mask = build_inputs(batch, capacity)
    seg_caps = measure_seg_caps(pts, rgb, mask)
    print(f"# seg caps {seg_caps}", flush=True)
    big = capacity > 32768
    cfg = InferenceConfig(
        point_capacity=capacity,
        seg_voxel_capacity=seg_caps[0],
        seg_hierarchy_caps=seg_caps[1:],
        ee_point_capacity=8192 if big else 2048,
        ee_voxel_capacity=8192 if big else 2048,
        kp_voxel_capacity=4096 if big else 1024,
        ee_hierarchy_caps=(4096, 1536, 512, 128) if big
        else (1024, 384, 128, 128),
        kp_hierarchy_caps=(3072, 2560, 1536, 512) if big
        else (768, 640, 384, 128),
        icp_iterations=15, icp_template_points=1024,
        conv_impl=impl,
        k3_self_keyed=os.environ.get("BENCH_K3_SK", "1") != "0",
    )
    engine = InferenceEngine(cfg, seed=0)
    print(f"# conv_impl={engine._conv_impl} B={batch} P={capacity} "
          f"sk={engine._k3_sk}", flush=True)
    pts, rgb, mask = jnp.asarray(pts), jnp.asarray(rgb), jnp.asarray(mask)
    if engine._conv_impl == "pallas-int8":
        engine.calibrate_q8(pts, rgb, mask)

    rows = []
    dt, seg_out = timeit(engine._seg_jit,
                         (engine.params["segmentation"], pts, rgb, mask))
    rows.append(("STAGE seg", dt))
    _, _, ee_pts, ee_rgb, ee_valid, _ = seg_out

    dt, pose_out = timeit(engine._pose_jit,
                          (engine.params["rotation"], ee_pts, ee_rgb,
                           ee_valid))
    rows.append(("STAGE pose", dt))
    ee_pose = pose_out[0]

    dt, kp_out = timeit(engine._kp_jit, (engine.params["key_points"],
                                         ee_pts, ee_rgb, ee_valid))
    rows.append(("STAGE kp", dt))

    dt, _ = timeit(engine._icp_jit, (engine.template, ee_pts, ee_valid,
                                     ee_pose, kp_out[0]))
    rows.append(("STAGE icp", dt))

    def full(pts, rgb, mask):
        return engine.predict_batch_arrays(pts, rgb, mask)

    dt, _ = timeit(full, (pts, rgb, mask))
    rows.append(("FULL pipeline", dt))

    # ---- seg sub-pieces under the engine's impl/sk settings
    from mrcc_tpu.geometry.preprocess import (center_at_origin,
                                              normalize_colors)
    from mrcc_tpu.sparse import build_hierarchy, voxelize
    from mrcc_tpu.sparse.impl import sparse_impl
    from mrcc_tpu.solve import largest_cluster_mask
    from functools import partial

    caps = engine._hierarchy_caps(cfg.seg_voxel_capacity,
                                  cfg.seg_hierarchy_caps)

    @jax.jit
    def f_vox(pts, rgb, mask):
        c, _ = center_at_origin(pts, mask=mask)
        return voxelize(c, normalize_colors(rgb, mask=mask), mask,
                        1 / cfg.seg_scale, cfg.seg_voxel_capacity)

    dt, (vox, _, _) = timeit(f_vox, (pts, rgb, mask))
    rows.append(("  seg: voxelize", dt))

    def f_hier(vox):
        with sparse_impl(engine._conv_impl):
            return build_hierarchy(vox, 4, capacities=caps,
                                   k3_self_keyed=engine._k3_sk)

    dt, levels = timeit(jax.jit(f_hier), (vox,))
    rows.append(("  seg: hierarchy", dt))

    def f_unet(params, feats, levels):
        from mrcc_tpu.sparse.conv import conv_impl
        with conv_impl(engine._conv_impl):
            return engine._seg_model.apply(
                params, feats.astype(jnp.dtype(cfg.compute_dtype)), levels)

    dt, _ = timeit(jax.jit(f_unet), (engine.params["segmentation"],
                                     vox.feats, levels))
    rows.append(("  seg: U-Net", dt))

    @jax.jit
    def f_cluster(points, seg_mask):
        from mrcc_tpu.app.inference_engine import cluster_capacity
        return jax.vmap(partial(largest_cluster_mask, dist=cfg.cluster_dist,
                                capacity=cluster_capacity(cfg)))(points,
                                                                 seg_mask)

    seg_mask = mask & (jnp.arange(capacity)[None] % 8 == 0)
    dt, _ = timeit(f_cluster, (pts, seg_mask))
    rows.append(("  seg: cluster", dt))

    @jax.jit
    def f_crop(points, rgb, ee_mask):
        e = cfg.ee_point_capacity
        order = jnp.argsort(~ee_mask, axis=-1, stable=True)[:, :e]
        ee_pts = jnp.take_along_axis(points, order[..., None], axis=1)
        ee_rgb = jnp.take_along_axis(rgb, order[..., None], axis=1)
        return ee_pts, ee_rgb, jnp.take_along_axis(ee_mask, order, axis=1)

    dt, _ = timeit(f_crop, (pts, rgb, seg_mask))
    rows.append(("  seg: crop-argsort", dt))

    print(f"\n{'piece':22s} {'ms':>9s}")
    for name, dt in rows:
        print(f"{name:22s} {dt*1e3:9.2f}")
    full_dt = dict(rows)["FULL pipeline"]
    print(f"\nimplied clouds/s: {batch/full_dt:.2f}")


if __name__ == "__main__":
    main()
