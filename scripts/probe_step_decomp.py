"""Decompose the conv kernel's per-step cost: one-hot build vs MXU dots.

Variants of the real windowed gather-GEMM inner step at bench L0/L1 shapes:
  full      — the real kernel (compare-built one-hot + gather dots + GEMM)
  const-oh  — one-hot replaced by a CONSTANT bf16 matrix (same dots; no
              compare/astype)  -> isolates the VPU compare cost
  no-dots   — one-hot built, but only summed (VPU only; no MXU)
  fewer-cmp — one-hot built in ONE compare (eq only, no range masks)

Run alone on the TPU:  python scripts/probe_step_decomp.py
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
        for j in range(KG):
            flat = (j * B + bi) * NT + ti
            st = starts_ref[flat]
            local0 = idx_ref[0, 0, j, :] - st
            window0 = feats_ref[0, pl.ds(pl.multiple_of(st, 8), W), :]
            if variant == "const-oh":
                oh = (iota_w == 7)  # constant compare hoisted by Mosaic
            else:
                oh = local0[:, None] == iota_w
            if variant == "no-dots":
                g = (oh.astype(jnp.bfloat16)
                     @ jnp.ones((W, C), jnp.bfloat16))  # cheap dot? no —
                # sum instead: [T, W] -> [T, C] via broadcast of row sums
                g = jnp.broadcast_to(
                    jnp.sum(oh.astype(jnp.bfloat16), axis=1, keepdims=True),
                    (T, C))
            else:
                g = jnp.dot(oh.astype(jnp.bfloat16), window0,
                            preferred_element_type=jnp.float32)
            gall_ref[:, j * C:(j + 1) * C] = g.astype(jnp.bfloat16)
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
    # monotone near-diagonal indices like real kernel maps
    base = np.arange(N)
    idx = np.zeros((B, NT, KG, T), np.int32)
    starts = np.zeros((KG, B, NT), np.int32)
    for j in range(KG):
        shift = int(rng.integers(-N // 3, N // 3))
        ix = np.clip(base + shift, 0, N - 1)
        for ti in range(NT):
            tile = ix[ti * T:(ti + 1) * T]
            st = min(max(tile.min() - tile.min() % 8, 0), N - W)
            starts[j, :, ti] = st
            idx[:, ti, j, :] = tile
    feats = jnp.asarray(rng.normal(size=(B, N, C)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(1, KG * C, COUT)) / 60, jnp.bfloat16)
    starts_f = jnp.asarray(starts.reshape(-1))
    idx_t = jnp.asarray(idx)

    steps = B * NT
    for variant in ("full", "const-oh", "no-dots"):
        f = jax.jit(functools.partial(call, variant))
        try:
            dt = run(f, starts_f, idx_t, feats, w)
        except Exception as e:  # noqa: BLE001
            print(f"{variant:10s} FAILED {str(e)[:110]}")
            continue
        print(f"{variant:10s} {dt*1e3:7.2f} ms   {dt/steps*1e6:6.2f} us/step")


if __name__ == "__main__":
    main()
