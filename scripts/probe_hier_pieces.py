"""Marginal cost of hierarchy-build pieces at bench shapes (ROADMAP r3).

hierarchy(seg) is ~51 ms of the 350 ms batch — second wall after the
U-Net.  Chain-marginal each component the build runs per level:

  argsort    the downsample argsort over [B, N] parent keys
  nbr        neighbor_tables (27-offset rank kernel + tiled pack)
  child      child_tables (8-offset rank kernel + tiled pack)
  uptiled    _up_tiled_maps (XLA min/max spans + transposes)
  voxsort    voxelize's initial argsort + sorted gathers (points)

Each chain feeds its output back into the next rep's input where possible
(sequential dependency, no CSE); otherwise reps use distinct inputs.

Run alone on the TPU:  python scripts/probe_hier_pieces.py
Env: BENCH_BATCH (8), BENCH_POINTS (16384), CONV_IMPL (pallas), REPS (7)
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
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def measure(tag, make_chain, args, reps, cnt=1):
    f1 = jax.jit(functools.partial(make_chain, x_reps=1))
    fx = jax.jit(functools.partial(make_chain, x_reps=reps))
    try:
        t1 = timeit(f1, args)
        tx = timeit(fx, args)
    except Exception as e:  # noqa: BLE001
        print(f"{tag:24s} FAILED {str(e)[:110]}", flush=True)
        return 0.0
    marg = (tx - t1) / (reps - 1)
    print(f"{tag:24s} marginal {marg*1e3:7.2f} ms  1-call {t1*1e3:7.2f}"
          f"  est*cnt {marg*cnt*1e3:7.1f} ms", flush=True)
    return marg * cnt


def main():
    from bench import build_inputs, measure_seg_caps

    from mrcc_tpu.geometry.preprocess import center_at_origin
    from mrcc_tpu.ops.rank_pallas import child_tables, neighbor_tables
    from mrcc_tpu.sparse import build_hierarchy, voxelize
    from mrcc_tpu.sparse.hierarchy import (K2_OFFSETS, K3_OFFSETS,
                                           _up_tiled_maps)
    from mrcc_tpu.sparse.impl import sparse_impl

    batch = int(os.environ.get("BENCH_BATCH", 8))
    capacity = int(os.environ.get("BENCH_POINTS", 16384))
    impl = os.environ.get("CONV_IMPL", "pallas")
    reps = int(os.environ.get("REPS", 7))

    pts, rgb, mask = build_inputs(batch, capacity)
    caps = measure_seg_caps(pts, rgb, mask)
    print(f"# caps {caps}  B={batch}  impl={impl}", flush=True)
    pts, rgb, mask = jnp.asarray(pts), jnp.asarray(rgb), jnp.asarray(mask)

    @jax.jit
    def prep(pts, rgb, mask):
        c, _ = center_at_origin(pts, mask=mask)
        vox, _, _ = voxelize(c, rgb, mask, 1 / 200.0, caps[0])
        return vox

    vox = prep(pts, rgb, mask)

    def build(vox):
        with sparse_impl(impl):
            return build_hierarchy(vox, 4, capacities=caps[1:])

    levels = jax.jit(build)(vox)
    total = 0.0
    rng = np.random.default_rng(0)

    # whole-build marginal (chained by re-keying off the rep index so XLA
    # cannot CSE: shift coordinates by r voxels)
    def whole(vox, x_reps):
        acc = 0.0
        for r in range(x_reps):
            import dataclasses
            v2 = dataclasses.replace(vox, off=vox.off + r)
            with sparse_impl(impl):
                lv = build_hierarchy(v2, 4, capacities=caps[1:])
            acc = acc + lv[-1].key.sum() + lv[0].nbr_idx.sum()
        return acc

    measure("WHOLE build_hierarchy", whole, (vox,), max(reps // 2, 3))

    # ---- argsort of parent keys per level
    for li in range(4):
        key = levels[li].key

        def chain(k, x_reps):
            for _ in range(x_reps):
                order = jnp.argsort(k)
                k = k[jnp.arange(k.shape[0])[:, None], order] + 1
            return k.sum()

        total += measure(f"argsort L{li} n={key.shape[1]}", chain, (key,),
                         reps)

    # ---- neighbor tables (27-offset rank kernel + tiled pack)
    for li in range(5):
        lv = levels[li]

        def chain(off, key, valid, x_reps, li=li):
            acc = 0
            for r in range(x_reps):
                with sparse_impl(impl):
                    idx, hit, tiled = __import__(
                        "mrcc_tpu.sparse.hierarchy", fromlist=["x"]
                    )._neighbor_tables(off, key + r, valid, K3_OFFSETS)
                acc = acc + idx.sum() + tiled[0].sum()
            return acc

        total += measure(f"nbr27 L{li} n={lv.key.shape[1]}", chain,
                         (lv.off, lv.key, lv.valid), max(reps // 2, 3))

    # ---- child tables (8-offset rank kernel)
    for li in range(4):
        fine, coarse = levels[li], levels[li + 1]

        def chain(poff, pkey, pvalid, ckey, x_reps):
            acc = 0
            for r in range(x_reps):
                with sparse_impl(impl):
                    idx, hit, tiled = child_tables(
                        poff, pkey + r, pvalid, ckey, K2_OFFSETS,
                        return_tiled=True)
                acc = acc + idx.sum() + tiled[0].sum()
            return acc

        total += measure(f"child8 L{li+1} np={coarse.key.shape[1]}", chain,
                         (coarse.off, coarse.key, coarse.valid, fine.key),
                         max(reps // 2, 3))

    # ---- up-tiled map build
    for li in range(4):
        fine = levels[li]
        cap = caps[1:][li]

        def chain(pidx, pok, octant, fvalid, x_reps, cap=cap):
            acc = 0
            for r in range(x_reps):
                t = _up_tiled_maps(pidx + r - r, pok, octant, fvalid, cap)
                acc = acc + t[0].sum() + t[1].sum() + r
            return acc

        total += measure(f"uptiled L{li} n={fine.key.shape[1]}", chain,
                         (fine.parent_idx, fine.parent_ok, fine.octant,
                          fine.valid), max(reps // 2, 3))

    # ---- voxelize (whole, chained via shifted points)
    def vchain(pts, rgb, mask, x_reps):
        acc = 0.0
        for r in range(x_reps):
            vox, pv, _ = voxelize(pts + r * 0.005, rgb, mask, 1 / 200.0,
                                  caps[0])
            acc = acc + vox.key.sum() + pv.sum()
        return acc

    measure("WHOLE voxelize", vchain, (pts, rgb, mask), max(reps // 2, 3))

    print(f"\nTOTAL measured pieces: {total*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
