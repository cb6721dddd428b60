"""Marginal cost of the 18D U-Net's NON-k3 pieces (ROADMAP r3 #3).

probe_conv_marginal.py located the k3 classes (~136 ms of the ~241 ms
U-Net at B=8/16k).  This probe measures the rest the same way — X copies
chained inside ONE jit, reporting (t(X) - t(1)) / (X - 1):

  down   k2s2 convs  (L0->1 c32, L1->2 c32, L2->3 c64, L3->4 c128)
  up     k2s2 transposes (L4->3 256->384, then 384->384 x3)
  1x1    final conv + block-a shortcut projections
  bn     masked batch-norm apply (+ReLU) at the widest shapes

CSE note: each rep uses its OWN weight slice (stacked [X, ...]) so XLA
cannot collapse the chain; bn chains feed x back into itself.

Run alone on the TPU:  python scripts/probe_nonk3_marginal.py
Env: BENCH_BATCH (8), BENCH_POINTS (16384), CONV_IMPL (pallas), REPS (9)
"""

import functools
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

    levels = jax.jit(build)(prep(pts, rgb, mask))
    rng = np.random.default_rng(0)

    def measure(tag, make_chain, feats_shape, w_shape, cnt):
        feats = jnp.asarray(rng.normal(size=(batch,) + feats_shape),
                            jnp.bfloat16)
        ws = jnp.asarray(rng.normal(size=(reps,) + w_shape)
                         / max(w_shape[-2], 1), jnp.float32)
        f1 = jax.jit(functools.partial(make_chain, x_reps=1))
        fx = jax.jit(functools.partial(make_chain, x_reps=reps))
        try:
            t1 = timeit(f1, (feats, ws))
            tx = timeit(fx, (feats, ws))
        except Exception as e:  # noqa: BLE001
            print(f"{tag:22s} FAILED {str(e)[:110]}", flush=True)
            return 0.0
        marg = (tx - t1) / (reps - 1)
        print(f"{tag:22s} marginal {marg*1e3:7.3f} ms  1-call {t1*1e3:7.2f}"
              f"  est*cnt {marg*cnt*1e3:7.1f} ms", flush=True)
        return marg * cnt

    total = 0.0

    # ---- down convs (k2 s2): out accumulates so reps don't CSE
    downs = [("down L0->1 c32", 0, 32, 32), ("down L1->2 c32", 1, 32, 32),
             ("down L2->3 c64", 2, 64, 64), ("down L3->4 c128", 3, 128, 128)]
    for tag, li, cin, cout in downs:
        fine, coarse = levels[li], levels[li + 1]
        n = fine.key.shape[1]

        def chain(x, ws, x_reps, fine=fine, coarse=coarse):
            with sparse_impl(impl):
                acc = None
                for r in range(x_reps):
                    y = C.conv_down(x, ws[r], fine, coarse)
                    acc = y if acc is None else acc + y
            return acc.sum()

        total += measure(tag, chain, (n, cin), (8, cin, cout), 1)

    # ---- up transposes (k2 s2)
    ups = [("up L4->3 256->384", 3, 256, 384), ("up L3->2 c384", 2, 384, 384),
           ("up L2->1 c384", 1, 384, 384), ("up L1->0 c384", 0, 384, 384)]
    for tag, li, cin, cout in ups:
        coarse, fine = levels[li + 1], levels[li]
        nc = coarse.key.shape[1]

        def chain(x, ws, x_reps, coarse=coarse, fine=fine):
            with sparse_impl(impl):
                acc = None
                for r in range(x_reps):
                    y = C.conv_transpose_up(x, ws[r], coarse, fine)
                    acc = y if acc is None else acc + y
            return acc.sum()

        total += measure(tag, chain, (nc, cin), (8, cin, cout), 1)

    # ---- 1x1 convs: block-a shortcut projections + final
    ones = [("1x1 L3 512->384 (sc)", 3, 512, 384),
            ("1x1 L2 448->384 (sc)", 2, 448, 384),
            ("1x1 L1 416->384 (sc)", 1, 416, 384),
            ("1x1 L0 416->384 (sc)", 0, 416, 384),
            ("1x1 L0 384->3 final", 0, 384, 128)]
    for tag, li, cin, cout in ones:
        lv = levels[li]
        n = lv.key.shape[1]

        def chain(x, ws, x_reps, lv=lv):
            acc = None
            for r in range(x_reps):
                y = C.conv1x1(x, ws[r], lv.valid)
                acc = y if acc is None else acc + y
            return acc.sum()

        total += measure(tag, chain, (n, cin), (cin, cout), 1)

    # ---- masked BN apply + ReLU at decoder widths (chained x -> bn(x))
    bns = [("bn+relu L0 c384", 0, 384, 4), ("bn+relu L1 c384", 1, 384, 4),
           ("bn+relu L0 c32", 0, 32, 4), ("bn+relu L4 c256", 4, 256, 8)]
    for tag, li, c, cnt in bns:
        lv = levels[li]
        n = lv.key.shape[1]
        valid = lv.valid

        def chain(x, ws, x_reps, valid=valid):
            for r in range(x_reps):
                cnt_v = jnp.maximum(valid.sum(), 1).astype(jnp.float32)
                xf = x.astype(jnp.float32)
                mean = (xf * valid[..., None]).sum(axis=(0, 1)) / cnt_v
                var = (((xf - mean) ** 2) * valid[..., None]).sum(
                    axis=(0, 1)) / cnt_v
                y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
                x = jnp.maximum(y, 0).astype(jnp.bfloat16) + ws[r, 0, 0]
            return x.sum()

        total += measure(tag, chain, (n, c), (1, 1), cnt)

    print(f"\nTOTAL est non-k3 in 18D net: {total*1e3:.1f} ms")


if __name__ == "__main__":
    main()
