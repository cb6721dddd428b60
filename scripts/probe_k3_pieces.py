#!/usr/bin/env python3
"""Split the k3 neighbour-table cost (ROADMAP r5 #1) into its pieces.

RESULTS r4: the k3 27-neighbour tables are 33.8 ms of the ~53 ms
voxelize+hierarchy at B=8/16k — the hierarchy wall once the U-Net
shrank.  rank_lookup (ops/rank_pallas.py) has four candidate costs:

  a. the boundary searchsorted (method='sort': XLA sorts N + K*nt keys
     per level — the only remaining XLA sort on the pipeline),
  b. the qvalid build (off_q = off + offsets materializes [27,B,N,3]),
  c. the Pallas _rank_call itself,
  d. the output/tiled-pack transposes.

Variants stop after each piece; consecutive deltas price the piece.
Run ALONE on the TPU.  Env: PROBE_B, PROBE_ITERS.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import mrcc_tpu
    from mrcc_tpu.ops import rank_pallas as R
    from mrcc_tpu.sparse import hierarchy as H
    from mrcc_tpu.sparse import voxelize
    from mrcc_tpu.sparse.impl import sparse_impl
    from mrcc_tpu.sparse.types import COORD_RANGE, KEY_PAD

    mrcc_tpu.enable_compilation_cache()
    b = int(os.environ.get("PROBE_B", 8))
    npts = 16384
    iters = int(os.environ.get("PROBE_ITERS", 20))
    caps = (12288, 9856, 6400, 2816, 896)

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

    offsets = H.K3_OFFSETS
    deltas = tuple(int(d) for d in R.pack_deltas(offsets))
    k = len(deltas)

    # build all level key/off/valid sets once (host side constants for the
    # probe programs)
    with sparse_impl("pallas"):
        vox, _, _ = jax.jit(
            lambda p, r, m: voxelize(p, r, m, 1 / 200.0, caps[0]))(
                pts, rgb, mask)
        levels = jax.jit(
            lambda v: H.build_hierarchy(v, 4, capacities=caps[1:],
                                        build_k3=False))(vox)
    lvl_data = [(np.asarray(l.off), np.asarray(l.key), np.asarray(l.valid))
                for l in levels]
    print("level sizes:", [d[1].shape for d in lvl_data], flush=True)

    def qvalid_for(off, valid):
        # the library's six-mask build (the [K, B, N, 3] broadcast this
        # replaced measured 3.9 ms standalone; fused in-program the win
        # is smaller — see the tables rows)
        return R._border_qvalid(off, valid, offsets)

    def boundary_only(off, key, valid):
        n = key.shape[1]
        t = min(R._pick_tile(n), 128)
        nt = n // t
        qb = key[:, ::t]
        deltas_arr = jnp.asarray(deltas, jnp.int32)
        queries = (qb[None, :, :] + deltas_arr[:, None, None])
        flat_q = queries.transpose(1, 0, 2).reshape(b, k * nt)
        ranks = jax.vmap(lambda ky, qq: jnp.searchsorted(
            ky, qq, side="left", method="sort"))(key, flat_q)
        return ranks.astype(jnp.int32).sum()

    def boundary_count(off, key, valid):
        # candidate replacement: rank = #{keys < q} by compare-count
        n = key.shape[1]
        t = min(R._pick_tile(n), 128)
        nt = n // t
        qb = key[:, ::t]
        deltas_arr = jnp.asarray(deltas, jnp.int32)
        queries = (qb[None, :, :] + deltas_arr[:, None, None])
        flat_q = queries.transpose(1, 0, 2).reshape(b, k * nt)
        ranks = (key[:, None, :] < flat_q[:, :, None]).sum(
            axis=-1, dtype=jnp.int32)
        return ranks.sum()

    def qvalid_only(off, key, valid):
        return qvalid_for(off, valid).sum()

    def full_tables(off, key, valid):
        idx, hit, tiled = R.neighbor_tables(off, key, valid, offsets,
                                            return_tiled=True)
        return idx.sum() + hit.sum() + tiled[0].sum()

    def tables_untiled(off, key, valid):
        idx, hit = R.neighbor_tables(off, key, valid, offsets,
                                     return_tiled=False)
        return idx.sum() + hit.sum()

    variants = [
        ("boundary searchsorted", boundary_only),
        ("boundary compare-count", boundary_count),
        ("qvalid build", qvalid_only),
        ("tables (no tiled pack)", tables_untiled),
        ("tables + tiled pack", full_tables),
    ]

    print(f"devices: {jax.devices()}  B={b} caps={caps}", flush=True)
    with sparse_impl("pallas"):
        for name, fn in variants:
            # sum over all 5 levels, one jit program (mirrors hierarchy)
            def prog(args, fn=fn):
                acc = jnp.int32(0)
                for off, key, valid in args:
                    acc += fn(off, key, valid).astype(jnp.int32)
                return acc

            args = [(jnp.asarray(o), jnp.asarray(kk), jnp.asarray(v))
                    for o, kk, v in lvl_data]
            f = jax.jit(prog)
            out = f(args)
            jax.device_get(out)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(args)
            jax.device_get(out)
            dt = (time.perf_counter() - t0) / iters * 1e3
            print(f"{name:26s} {dt:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
