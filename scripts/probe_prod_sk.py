"""Production-scale (B=2/131k) self-keyed vs table breakdown (round 5).

Times, under the int8 impl at the bench's measured production capacities:
  - hierarchy build WITH k3 tables vs WITH self-keyed packs vs no-k3
  - seg U-Net apply on each hierarchy
and the same for bf16.  Locates where the production wall actually is.

Run alone on the TPU: python scripts/probe_prod_sk.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, args, iters=5):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters, out


def main():
    from bench import build_inputs, measure_seg_caps
    from mrcc_tpu.models import RobotNetSegmentation
    from mrcc_tpu.sparse import build_hierarchy, voxelize
    from mrcc_tpu.sparse.impl import sparse_impl

    batch = int(os.environ.get("BENCH_BATCH", 2))
    capacity = int(os.environ.get("BENCH_POINTS", 131072))
    backbone = os.environ.get("BENCH_SEG_BACKBONE", "minkunet18")

    pts, rgb, mask = build_inputs(batch, capacity)
    seg_caps = measure_seg_caps(pts, rgb, mask)
    print(f"# seg caps {seg_caps}", flush=True)
    caps = seg_caps[1:]
    pts, rgb, mask = jnp.asarray(pts), jnp.asarray(rgb), jnp.asarray(mask)

    model = RobotNetSegmentation(backbone=backbone, in_channels=3,
                                 num_classes=3)

    @jax.jit
    def f_vox(pts, rgb, mask):
        return voxelize(pts, rgb, mask, 1 / 200.0, seg_caps[0])

    dt, (vox, _, _) = timeit(f_vox, (pts, rgb, mask))
    print(f"voxelize               {dt*1e3:9.2f} ms", flush=True)

    for impl in ("pallas-int8", "pallas"):
        print(f"--- impl={impl}", flush=True)

        params = None
        for tag, sk, k3 in (("tables", False, True),
                            ("self-keyed", True, True),
                            ("no-k3", False, False)):
            def f_hier(vox, sk=sk, k3=k3):
                with sparse_impl(impl):
                    return build_hierarchy(vox, 4, capacities=caps,
                                           build_k3=k3, k3_self_keyed=sk)

            f_hier = jax.jit(f_hier)
            try:
                dt, levels = timeit(f_hier, (vox,))
            except Exception as e:  # noqa: BLE001
                print(f"hier {tag:12s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                continue
            n_sk = sum(lv.nbr_sk is not None for lv in levels)
            print(f"hier {tag:12s} {dt*1e3:9.2f} ms  (sk levels: {n_sk})",
                  flush=True)
            if not k3:
                continue

            def f_unet(params, feats, levels):
                from mrcc_tpu.sparse.conv import conv_impl
                with conv_impl(impl):
                    return model.apply(params, feats.astype(jnp.bfloat16),
                                       levels)

            f_unet = jax.jit(f_unet)
            if params is None:
                with sparse_impl(impl):
                    params = model.init(jax.random.PRNGKey(0),
                                        vox.feats.astype(jnp.bfloat16),
                                        levels)
            try:
                dt, _ = timeit(f_unet, (params, vox.feats, levels))
                print(f"unet {tag:12s} {dt*1e3:9.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"unet {tag:12s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
