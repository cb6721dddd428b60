"""Marginal per-conv cost measured INSIDE one jit program.

bench_unet_convs.py times each conv as its own jit call; on this tunneled
runtime that inflates per-call cost ~10x vs the same conv composed into a
program (its totals exceed the measured whole-U-Net time).  This probe
chains X copies of one conv shape inside ONE jit and reports
(t(X) - t(1)) / (X - 1) — the true composed cost.

Run alone on the TPU:  python scripts/probe_conv_marginal.py
Env: BENCH_BATCH (8), BENCH_POINTS (16384), CONV_IMPL (pallas), REPS (9)
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
    from mrcc_tpu.sparse import build_hierarchy, voxelize
    from mrcc_tpu.sparse import conv as C
    from mrcc_tpu.sparse.impl import sparse_impl

    batch = int(os.environ.get("BENCH_BATCH", 8))
    capacity = int(os.environ.get("BENCH_POINTS", 16384))
    impl = os.environ.get("CONV_IMPL", "pallas")
    reps = int(os.environ.get("REPS", 9))

    pts, rgb, mask = build_inputs(batch, capacity)
    caps = measure_seg_caps(pts, rgb, mask)
    print(f"# caps {caps}  B={batch}  impl={impl}")
    pts, rgb, mask = jnp.asarray(pts), jnp.asarray(rgb), jnp.asarray(mask)

    @jax.jit
    def prep(pts, rgb, mask):
        c, _ = center_at_origin(pts, mask=mask)
        vox, _, _ = voxelize(c, rgb, mask, 1 / 200.0, caps[0])
        return vox

    def build(vox):
        with sparse_impl(impl):
            return build_hierarchy(vox, 4, capacities=caps[1:])

    levels = jax.jit(build)(prep(pts, rgb, mask))

    # (tag, level_idx, cin==cout, count-in-18D-net)
    # 18D decoder PLANES are 384 at EVERY level (the engine's backbone is
    # MinkUNet18D) — earlier revisions modeled the default-PLANES c96
    # decoder and under-estimated the net by ~110 ms.
    shapes = [
        ("k3 L0 c32", 0, 32, 1),       # stem class
        ("k3 L0 c384", 0, 384, 4),     # block8 class (a is 416->384)
        ("k3 L1 c384", 1, 384, 4),     # block7 class (a is 448->384)
        ("k3 L2 c384", 2, 384, 4),     # block6 class (a is 448->384)
        ("k3 L1 c32", 1, 32, 4),       # block1 class
        ("k3 L2 c64", 2, 64, 4),       # block2 class
        ("k3 L3 c128", 3, 128, 4),     # block3 class
        ("k3 L3 c384", 3, 384, 4),     # block5 class (a is 512->384)
        ("k3 L4 c256", 4, 256, 4),     # block4 class
    ]
    rng = np.random.default_rng(0)
    for tag, li, c, cnt in shapes:
        lv = levels[li]
        n = lv.key.shape[1]
        feats = jnp.asarray(rng.normal(size=(batch, n, c)), jnp.bfloat16)
        wgt = jnp.asarray(rng.normal(size=(27, c, c)) / c, jnp.float32)

        def chain(x, w, lv, x_reps):
            with sparse_impl(impl):
                for _ in range(x_reps):
                    x = C.conv_k3(x, w, lv).astype(jnp.bfloat16)
            return x.sum()

        import functools
        f1 = jax.jit(functools.partial(chain, x_reps=1))
        fx = jax.jit(functools.partial(chain, x_reps=reps))
        try:
            t1 = timeit(f1, (feats, wgt, lv))
            tx = timeit(fx, (feats, wgt, lv))
        except Exception as e:  # noqa: BLE001
            print(f"{tag:12s} FAILED {str(e)[:120]}")
            continue
        marg = (tx - t1) / (reps - 1)
        hits = float(np.asarray(lv.nbr_hit.sum()))
        real_gf = 2 * hits * c * c / 1e9
        gath_gf = 2 * 27 * batch * n * 256 * c / 1e9
        print(f"{tag:12s} n={n:6d} marginal {marg*1e3:7.2f} ms  "
              f"1-call {t1*1e3:7.2f}  real {real_gf:6.1f} GF "
              f"({real_gf/marg/1e3:5.2f} TF/s)  gather {gath_gf:6.1f} GF "
              f"({gath_gf/marg/1e3:5.2f} TF/s)  est*cnt {marg*cnt*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
