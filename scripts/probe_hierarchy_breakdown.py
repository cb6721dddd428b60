#!/usr/bin/env python3
"""Decompose voxelize + hierarchy-build cost (VERDICT r3 #5).

The r3 stage profile has voxelize 13.0 ms + hierarchy 51.5 ms of the
349.6 ms fused pipeline at B=8/16k (RESULTS.md) — 18%, and the binding
wall once the U-Net shrinks.  Before building a Pallas sort, measure WHAT
inside the build actually costs: program variants that stop after each
piece; differences between consecutive variants price the piece (the
~1.3-2.5 ms dispatch floor cancels).

Run ALONE on the TPU.  Env: PROBE_B, PROBE_PTS, PROBE_ITERS.
"""

import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import mrcc_tpu
    from mrcc_tpu.sparse import hierarchy as H
    from mrcc_tpu.sparse import voxelize
    from mrcc_tpu.sparse.impl import sparse_impl

    mrcc_tpu.enable_compilation_cache()
    b = int(os.environ.get("PROBE_B", 8))
    npts = int(os.environ.get("PROBE_PTS", 16384))
    iters = int(os.environ.get("PROBE_ITERS", 20))
    caps = (12288, 9856, 6400, 2816, 896)  # bench honest capacities

    from mrcc_tpu.data.synthetic import generate_sample

    pts = np.zeros((b, npts, 3), np.float32)
    rgb = np.zeros((b, npts, 3), np.float32)
    mask = np.zeros((b, npts), bool)
    for i in range(b):
        s = generate_sample(seed=i, n_ee=npts // 8, n_arm=npts * 3 // 16,
                            n_bg=npts * 7 // 16)
        n = min(len(s["points"]), npts)
        pts[i, :n] = s["points"][:n]
        rgb[i, :n] = s["rgb"][:n]
        mask[i, :n] = True
    pts, rgb, mask = jnp.asarray(pts), jnp.asarray(rgb), jnp.asarray(mask)

    def vox_only(pts, rgb, mask):
        vox, pv, _ = voxelize(pts, rgb, mask, 1 / 200.0, caps[0])
        return vox, vox.key.astype(jnp.int32).sum() + pv.sum()

    def down_chain(pts, rgb, mask, with_child=False, with_up=False,
                   with_k3=False):
        vox, pv, _ = vox_only(pts, rgb, mask)[0], 0, 0
        acc = vox.key.astype(jnp.int32).sum()
        off, key, valid = vox.off, vox.key, vox.valid
        for l in range(4):
            cap = caps[l + 1]
            skey, order = H._downsample_sort(off, valid)
            uoff, ukey, uvalid, ucount, pidx, pok, octant = jax.vmap(
                partial(H._downsample_one, capacity=cap))(off, valid,
                                                          skey, order)
            if with_child:
                cidx, chit, ctiled = H._child_tables(uoff, ukey, uvalid,
                                                     key, H.K2_OFFSETS)
                acc += cidx.sum()
                if ctiled is not None:
                    acc += ctiled[0].sum()
            if with_up and key.shape[1] % 8 == 0:
                up = H._up_tiled_maps(pidx, pok, octant, valid, cap)
                acc += up[0].sum()
            if with_k3:
                nidx, nhit, ntiled = H._neighbor_tables(off, key, valid,
                                                        H.K3_OFFSETS)
                acc += nidx.sum()
                if ntiled is not None:
                    acc += ntiled[0].sum()
            acc += pidx.sum() + ukey.astype(jnp.int32).sum()
            off, key, valid = uoff, ukey, uvalid
        if with_k3:
            nidx, nhit, ntiled = H._neighbor_tables(off, key, valid,
                                                    H.K3_OFFSETS)
            acc += nidx.sum()
        return acc

    def full(pts, rgb, mask):
        vox, pv, _ = voxelize(pts, rgb, mask, 1 / 200.0, caps[0])
        levels = H.build_hierarchy(vox, 4, capacities=caps[1:])
        acc = pv.sum()
        for lv in levels:
            acc += lv.key.astype(jnp.int32).sum()
        return acc

    def extra_sort(pts, rgb, mask):
        vox, pv, _ = voxelize(pts, rgb, mask, 1 / 200.0, caps[0])
        # one more full-width argsort (the voxelize sort re-priced alone);
        # xor defeats CSE against voxelize's own sort
        o = jnp.argsort(vox.key ^ jnp.uint32(1) if vox.key.dtype ==
                        jnp.uint32 else vox.key ^ 1, axis=-1)
        return vox.key.astype(jnp.int32).sum() + o.sum()

    variants = [
        ("voxelize only", lambda p, r, m: vox_only(p, r, m)[1]),
        ("extra L0 argsort", extra_sort),
        ("+ 4x downsample", partial(down_chain)),
        ("+ child tables", partial(down_chain, with_child=True)),
        ("+ up maps", partial(down_chain, with_child=True, with_up=True)),
        ("+ k3 nbr (FULL-equiv)", partial(down_chain, with_child=True,
                                          with_up=True, with_k3=True)),
        ("build_hierarchy (real)", full),
    ]

    print(f"devices: {jax.devices()}  B={b} pts={npts} caps={caps}",
          flush=True)
    prev = None
    with sparse_impl("pallas"):
        for name, fn in variants:
            f = jax.jit(fn)
            out = f(pts, rgb, mask)
            jax.device_get(out)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(pts, rgb, mask)
            jax.device_get(out)
            dt = (time.perf_counter() - t0) / iters * 1e3
            delta = "" if prev is None else f"  (delta {dt - prev:+7.2f})"
            print(f"{name:26s} {dt:8.2f} ms{delta}", flush=True)
            prev = dt


if __name__ == "__main__":
    main()
