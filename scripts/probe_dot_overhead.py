"""Isolate the per-step cost of the 27-dot gather structure.

int8 C128 runs at the SAME us/step as bf16 C128 (probe_tile_sweep) ->
the kernel is not MXU-FLOP-bound; something fixed per dot dominates.
Variants, all at the bench L0 shape (B=8, N=12544, T=256, C=128):

  base       27 distinct dynamic windows, 27 dots + 1 GEMM (the kernel)
  shared     ONE window slice shared by all 27 dots   (slice cost?)
  stacked    ONE [27T, W] x [W, C] dot via a vertically stacked one-hot
             + 27 accumulating [T, C] x [C, Cout] dots (dot-count cost?)
  gemm-only  just the final [T, 27C] x [27C, Cout] GEMM (GEMM floor)
  dots-only  27 dots, no GEMM                          (gather floor)

Run alone on the TPU:  python scripts/probe_dot_overhead.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N, T, W, KG, C, COUT = 8, 12544, 256, 384, 27, 128, 128
NT = N // T


def run(fn, *args, iters=10):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def make_kernel(variant):
    def kernel(starts_ref, idx_ref, feats_ref, w_ref, out_ref, gall_ref):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)

        if variant == "gemm-only":
            out_ref[0, :, :] = jnp.dot(gall_ref[:, :], w_ref[0],
                                       preferred_element_type=jnp.float32)
            return

        if variant == "stacked":
            # one [27T, W] one-hot against ONE shared window
            flat0 = (0 * B + bi) * NT + ti
            st = starts_ref[flat0]
            window = feats_ref[0, pl.ds(pl.multiple_of(st, 32), W), :]
            iota_big = jax.lax.broadcasted_iota(jnp.int32, (KG * T, W), 1)
            locs = []
            for j in range(KG):
                flat = (j * B + bi) * NT + ti
                stj = starts_ref[flat]
                locs.append(idx_ref[0, 0, j, :] - st)
            loc_big = jnp.concatenate(locs)[:, None]       # [27T, 1]
            oh = (loc_big == iota_big).astype(jnp.bfloat16)
            gv = jnp.dot(oh, window,
                         preferred_element_type=jnp.float32)  # [27T, C]
            acc = jnp.zeros((T, COUT), jnp.float32)
            for j in range(KG):
                acc = acc + jnp.dot(
                    gv[j * T:(j + 1) * T, :].astype(jnp.bfloat16),
                    w_ref[0, j * C:(j + 1) * C, :],
                    preferred_element_type=jnp.float32)
            out_ref[0, :, :] = acc
            return

        for j in range(KG):
            flat = (j * B + bi) * NT + ti
            st = starts_ref[flat]
            if variant == "shared":
                flat0 = (0 * B + bi) * NT + ti
                st0 = starts_ref[flat0]
                local0 = idx_ref[0, 0, j, :] - st0
                window0 = feats_ref[0, pl.ds(pl.multiple_of(st0, 32), W), :]
            else:
                local0 = idx_ref[0, 0, j, :] - st
                window0 = feats_ref[0, pl.ds(pl.multiple_of(st, 32), W), :]
            oh = local0[:, None] == iota_w
            g = jnp.dot(oh.astype(jnp.bfloat16), window0,
                        preferred_element_type=jnp.float32)
            gall_ref[:, j * C:(j + 1) * C] = g.astype(jnp.bfloat16)
        if variant == "dots-only":
            out_ref[0, :, :] = gall_ref[:, :COUT].astype(jnp.float32)
        else:
            out_ref[0, :, :] = jnp.dot(gall_ref[:, :], w_ref[0],
                                       preferred_element_type=jnp.float32)
    return kernel


def call(variant, starts, idx_t, feats, w):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NT),
        in_specs=[
            pl.BlockSpec((1, 1, KG, T), lambda bi, ti, s1: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda bi, ti, s1: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KG * C, COUT), lambda bi, ti, s1: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, COUT), lambda bi, ti, s1: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T, KG * C), jnp.bfloat16)],
    )
    return pl.pallas_call(
        make_kernel(variant),
        out_shape=jax.ShapeDtypeStruct((B, N, COUT), jnp.float32),
        grid_spec=grid_spec,
    )(starts, idx_t, feats, w)


def main():
    rng = np.random.default_rng(0)
    base = np.arange(N)
    idx = np.zeros((B, NT, KG, T), np.int32)
    starts = np.zeros((KG, B, NT), np.int32)
    for j in range(KG):
        # small shifts so a shared window covers all offsets (plane-local)
        shift = int(rng.integers(-40, 40))
        ix = np.clip(base + shift, 0, N - 1)
        for ti in range(NT):
            tile = ix[ti * T:(ti + 1) * T]
            st = min(max(int(tile.min()) - int(tile.min()) % 32, 0), N - W)
            starts[j, :, ti] = st
            idx[:, ti, j, :] = tile
    feats = jnp.asarray(rng.normal(size=(B, N, C)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(1, KG * C, COUT)) / 60, jnp.bfloat16)
    starts_f = jnp.asarray(starts.reshape(-1))
    idx_t = jnp.asarray(idx)

    steps = B * NT
    for variant in ("base", "shared", "stacked", "gemm-only", "dots-only"):
        f = jax.jit(functools.partial(call, variant))
        try:
            dt = run(f, starts_f, idx_t, feats, w)
        except Exception as e:  # noqa: BLE001
            print(f"{variant:10s} FAILED {str(e)[:140]}")
            continue
        print(f"{variant:10s} {dt*1e3:7.2f} ms   {dt/steps*1e6:6.2f} us/step")


if __name__ == "__main__":
    main()
