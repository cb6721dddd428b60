"""Prefix-truncation profile of the seg U-Net IN REAL CONTEXT.

probe_conv_marginal.py measures each conv class chained on ITSELF — the
chain's reps are independent (they all consume the same x), so the
scheduler can overlap the next rep's DMAs with compute.  The real net is
one sequential dependency chain; if per-conv DMA stalls are hidden by the
chain trick, marginals under-report.  (Current gap: U-Net apply 243 ms vs
sum-of-marginals ~134 ms.)

This probe times forward_except_final truncated after each stage
(stop_stage=0..7, then the full net + head) — each prefix is ONE jit
program with the same real sequential structure, so consecutive
differences are the true in-context stage costs.

Run alone on the TPU:  python scripts/probe_unet_prefix.py
Env: BENCH_BATCH (8), BENCH_POINTS (16384), CONV_IMPL (pallas)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, args, iters=10):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.perf_counter() - t0) / iters


def main():
    from bench import build_inputs, measure_seg_caps

    from mrcc_tpu.geometry.preprocess import center_at_origin
    from mrcc_tpu.models.robotnet import RobotNetSegmentation
    from mrcc_tpu.sparse import build_hierarchy, voxelize
    from mrcc_tpu.sparse.impl import sparse_impl

    batch = int(os.environ.get("BENCH_BATCH", 8))
    capacity = int(os.environ.get("BENCH_POINTS", 16384))
    impl = os.environ.get("CONV_IMPL", "pallas")

    pts, rgb, mask = build_inputs(batch, capacity)
    caps = measure_seg_caps(pts, rgb, mask)
    print(f"# caps {caps}  B={batch}  impl={impl}", flush=True)
    pts, rgb, mask = jnp.asarray(pts), jnp.asarray(rgb), jnp.asarray(mask)

    @jax.jit
    def prep(pts, rgb, mask):
        c, _ = center_at_origin(pts, mask=mask)
        vox, _, _ = voxelize(c, rgb, mask, 1 / 200.0, caps[0])
        return vox

    def build(vox):
        with sparse_impl(impl):
            return build_hierarchy(vox, 4, capacities=caps[1:])

    vox = prep(pts, rgb, mask)
    levels = jax.jit(build)(vox)
    feats = vox.feats.astype(jnp.bfloat16)

    seg = RobotNetSegmentation(backbone="minkunet", in_channels=3,
                               num_classes=3)
    full_params = seg.init(jax.random.PRNGKey(0), feats, levels)

    # the backbone module alone, for truncated prefixes
    from mrcc_tpu.models.minkunet import MinkUNetBase, make_minkunet

    unet = make_minkunet("minkunet", 3, 256)

    prev = 0.0
    for s in list(range(8)) + [None]:
        net = MinkUNetBase(in_channels=3, out_channels=256,
                           planes=unet.planes, layers=unet.layers,
                           block=unet.block)

        def run(params, feats, levels, s=s, net=net):
            with sparse_impl(impl):
                return net.apply(params, feats, levels, False, s,
                                 method="forward_except_final")

        params = net.init(jax.random.PRNGKey(0), feats, levels, False, s,
                          method="forward_except_final")
        f = jax.jit(run)
        try:
            dt = timeit(f, (params, feats, levels))
        except Exception as e:  # noqa: BLE001
            print(f"stage {s}: FAILED {str(e)[:120]}", flush=True)
            continue
        tag = "full-backbone" if s is None else f"..stage {s}"
        print(f"{tag:14s} cum {dt*1e3:8.2f} ms   stage {((dt-prev))*1e3:8.2f} ms",
              flush=True)
        prev = dt

    def run_head(params, feats, levels):
        with sparse_impl(impl):
            return seg.apply(params, feats, levels)

    dt = timeit(jax.jit(run_head), (full_params, feats, levels))
    print(f"{'full+head':14s} cum {dt*1e3:8.2f} ms   stage {((dt-prev))*1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
