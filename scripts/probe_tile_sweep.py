"""Sweep tile size / dtype / width for the windowed gather-GEMM step.

Finds the best (T, dtype, C) shape for the kernel's MXU dots: per-step
cost is dot-overhead-bound (probe_step_decomp: compares ~0.5 us of
11.6 us/step at T=256/C=128), so bigger tiles and wider lanes should
amortize.  Reports us/step and ms per L0-sized conv (B=8, N=12544).

Run alone on the TPU:  python scripts/probe_tile_sweep.py
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

B, N, KG = 8, 12544, 27


def run(fn, *args, iters=10):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def build_case(t, c, cout, dtype):
    w_width = t + 128
    nt = N // t
    rng = np.random.default_rng(0)
    base = np.arange(N)
    idx = np.zeros((B, nt, KG, t), np.int32)
    starts = np.zeros((KG, B, nt), np.int32)
    for j in range(KG):
        shift = int(rng.integers(-N // 3, N // 3))
        ix = np.clip(base + shift, 0, N - 1)
        for ti in range(nt):
            tile = ix[ti * t:(ti + 1) * t]
            st = min(max(int(tile.min()) - int(tile.min()) % 32, 0),
                     N - w_width)
            st -= st % 32
            starts[j, :, ti] = st
            idx[:, ti, j, :] = tile
    if dtype == jnp.int8:
        feats = jnp.asarray(rng.integers(-100, 100, (B, N, c)), jnp.int8)
        w = jnp.asarray(rng.integers(-20, 20, (1, KG * c, cout)), jnp.int8)
    else:
        feats = jnp.asarray(rng.normal(size=(B, N, c)), dtype)
        w = jnp.asarray(rng.normal(size=(1, KG * c, cout)) / 60, dtype)
    return (jnp.asarray(starts.reshape(-1)), jnp.asarray(idx), feats, w,
            w_width, nt)


def make_call(t, w_width, nt, c, cout, dtype):
    acc_t = jnp.int32 if dtype == jnp.int8 else jnp.float32

    def kernel(starts_ref, idx_ref, feats_ref, w_ref, out_ref, gall_ref):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (t, w_width), 1)
        for j in range(KG):
            flat = (j * B + bi) * nt + ti
            st = starts_ref[flat]
            local0 = idx_ref[0, 0, j, :] - st
            oh = local0[:, None] == iota_w
            window0 = feats_ref[0, pl.ds(pl.multiple_of(st, 32), w_width), :]
            g = jnp.dot(oh.astype(dtype), window0,
                        preferred_element_type=acc_t)
            gall_ref[:, j * c:(j + 1) * c] = g.astype(dtype)
        out_ref[0, :, :] = jnp.dot(gall_ref[:, :], w_ref[0],
                                   preferred_element_type=acc_t
                                   ).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, 1, KG, t), lambda bi, ti, s1: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, c), lambda bi, ti, s1: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KG * c, cout), lambda bi, ti, s1: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, cout), lambda bi, ti, s1: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((t, KG * c), dtype)],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, cout), jnp.float32),
        grid_spec=grid_spec,
    )


def main():
    cases = [
        ("bf16 T256 C128", 256, 128, 128, jnp.bfloat16),
        ("bf16 T512 C128", 512, 128, 128, jnp.bfloat16),
        ("bf16 T1024 C128", 1024, 128, 128, jnp.bfloat16),
        ("int8 T256 C128", 256, 128, 128, jnp.int8),
        ("int8 T512 C128", 512, 128, 128, jnp.int8),
        ("int8 T256 C384", 256, 384, 384, jnp.int8),
        ("int8 T512 C384", 512, 384, 384, jnp.int8),
    ]
    for name, t, c, cout, dtype in cases:
        if N % t:
            continue
        try:
            starts_f, idx_t, feats, w, w_width, nt = build_case(
                t, c, cout, dtype)
            f = jax.jit(make_call(t, w_width, nt, c, cout, dtype))
            dt = run(f, starts_f, idx_t, feats, w)
        except Exception as e:  # noqa: BLE001
            print(f"{name:16s} FAILED {str(e)[:110]}")
            continue
        steps = B * nt
        print(f"{name:16s} {dt*1e3:7.2f} ms  {dt/steps*1e6:6.2f} us/step")


if __name__ == "__main__":
    main()
