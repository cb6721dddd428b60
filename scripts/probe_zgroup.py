"""Is the gather-dot cost issue-bound (stationary-side reload floor)?

Theory from the W=T+64 null result: each [T, W] x [W, C] gather dot costs
~0.39 us regardless of W in 256..384 — the MXU reloads the [W, C]
stationary side (ceil(W/128) tiles) per dot, and 27 small dots pay 27
reloads.  If true, stacking the one-hots of G offsets that share a window
row-wise ([G*T, W] x [W, C], one dot) amortizes the reload G-fold.

Layout note: the grouped index vector [G*T] must be PREcomputed outside
the kernel ([B, nt, K/G, G*T] map layout) — an in-kernel [G, T] -> [G*T]
reshape merges sublanes into lanes, which Mosaic rejects.

z-triples (G=3) share a window exactly: their packed deltas differ by 1,
so their ranks differ by <= 1.  G=9/27 shown for the trend (timing only —
the shared-window assumption is synthetic here).

Run alone on the TPU:  python scripts/probe_zgroup.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N, K, C, COUT = 8, 12544, 27, 128, 384
T, W = 256, 320


def run(fn, *args, iters=20):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def make_call(g):
    """g = offsets per grouped dot (1 = the current kernel's shape).
    idx layout [B, nt, K//g, g*T]; starts [(K//g)*B*nt]."""
    nt = N // T
    ng = K // g

    def kernel(starts_ref, idx_ref, feats_ref, w_ref, out_ref, gall_ref,
               g3_ref):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (g * T, W), 1)
        for m in range(ng):
            flat = (m * B + bi) * nt + ti
            st = starts_ref[flat]
            local = idx_ref[0, 0, m, :] - st              # [g*T]
            oh = (local[:, None] == iota_w).astype(jnp.bfloat16)
            window = feats_ref[0, pl.ds(pl.multiple_of(st, 32), W), :]
            d = jnp.dot(oh, window, preferred_element_type=jnp.float32)
            if g == 1:
                gall_ref[:, m * C:(m + 1) * C] = d.astype(jnp.bfloat16)
            else:
                g3_ref[:, :] = d.astype(jnp.bfloat16)
                for j in range(g):
                    k = m * g + j
                    gall_ref[:, k * C:(k + 1) * C] = \
                        g3_ref[j * T:(j + 1) * T, :]
        out_ref[0, :, :] = jnp.dot(
            gall_ref[:, :], w_ref[0], preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, 1, ng, g * T), lambda bi, ti, s1:
                         (bi, ti, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda bi, ti, s1: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K * C, COUT), lambda bi, ti, s1: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, COUT), lambda bi, ti, s1: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T, K * C), jnp.bfloat16),
                        pltpu.VMEM((max(g, 2) * T, C), jnp.bfloat16)],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, COUT), jnp.bfloat16),
        grid_spec=grid_spec,
    )


def main():
    rng = np.random.default_rng(0)
    nt = N // T
    base = np.arange(N)
    idx = np.zeros((B, nt, K, T), np.int32)
    st27 = np.zeros((K, B, nt), np.int32)
    for m in range(9):
        shift = int(rng.integers(-30, 30))
        for j in range(3):
            k = m * 3 + j
            ix = np.clip(base + shift + (j - 1), 0, N - 1)
            for ti in range(nt):
                tile = ix[ti * T:(ti + 1) * T]
                st = max(int(tile.min()) - 8, 0)
                st -= st % 32
                st = min(st, N - W)
                st27[k, :, ti] = st
                idx[:, ti, k, :] = tile

    feats = jnp.asarray(rng.normal(size=(B, N, C)), jnp.bfloat16)
    wgt = jnp.asarray(rng.normal(size=(1, K * C, COUT)) / 60, jnp.bfloat16)
    steps = B * nt
    for tag, g in (("sep ", 1), ("zg3 ", 3), ("zg9 ", 9), ("zg27", 27)):
        ng = K // g
        # group-shared start = min over the group; clip indices into window
        stg = st27.reshape(ng, g, B, nt).min(axis=1)       # [ng, B, nt]
        idxg = idx.copy()
        for m in range(ng):
            lo = stg[m][:, :, None, None]                  # [B, nt, 1, 1]
            sl = idxg[:, :, m * g:(m + 1) * g, :]          # [B, nt, g, T]
            idxg[:, :, m * g:(m + 1) * g, :] = np.clip(sl, lo, lo + W - 1)
        idx_g = jnp.asarray(idxg.reshape(B, nt, ng, g * T))
        starts_f = jnp.asarray(stg.reshape(-1))
        try:
            f = jax.jit(make_call(g))
            dt = run(f, starts_f, idx_g, feats, wgt)
            print(f"{tag} {dt*1e3:7.2f} ms  {dt/steps*1e6:6.2f} us/step",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag} FAILED {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
