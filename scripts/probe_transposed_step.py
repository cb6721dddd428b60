"""Transposed conv-step layout: is output-column (N) tiling the missing
throughput axis?

probe_gemm_shape: the [T, 27C] x [27C, Cout] GEMM runs ~24-28 TF/s at ANY
M because Cout = 128 gives it ONE output-column tile, while [512x512]
square blocks reach ~240 TF/s.  A TRANSPOSED layout puts the TILE ROWS in
N instead: gall^T [27C, T] built by [C, W] x [W, T] dots from a
channel-major table, then out^T [Cout, T] = Wcat^T [Cout, 27C] @ gall^T
with N = T = 256-1024 column tiles.

Variants (same L0 shape: B=8, N=12544, 27 offsets, C=Cout=128):
  base      current layout (row-major table, [T,W] one-hots)
  tr        transposed (channel-major table [C, N]; lane-sliced windows,
            128-aligned starts)
  plus raw GEMM N-sweep rows the earlier probe lost.

Run alone on the TPU:  python scripts/probe_transposed_step.py
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

B, N, KG, C, COUT = 8, 12544, 27, 128, 128


def run(fn, *args, iters=10):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def base_call(t, w):
    nt = N // t

    def kernel(starts_ref, idx_ref, feats_ref, w_ref, out_ref, gall_ref):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (t, w), 1)
        for j in range(KG):
            flat = (j * B + bi) * nt + ti
            st = starts_ref[flat]
            local0 = idx_ref[0, 0, j, :] - st
            oh = local0[:, None] == iota_w
            window = feats_ref[0, pl.ds(pl.multiple_of(st, 32), w), :]
            g = jnp.dot(oh.astype(jnp.bfloat16), window,
                        preferred_element_type=jnp.float32)
            gall_ref[:, j * C:(j + 1) * C] = g.astype(jnp.bfloat16)
        out_ref[0, :, :] = jnp.dot(gall_ref[:, :], w_ref[0],
                                   preferred_element_type=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, 1, KG, t), lambda bi, ti, s1: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda bi, ti, s1: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KG * C, COUT), lambda bi, ti, s1: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, COUT), lambda bi, ti, s1: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((t, KG * C), jnp.bfloat16)],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, COUT), jnp.float32),
        grid_spec=grid_spec,
    )


def tr_call(t, w):
    """Channel-major table [B, C, N]; windows are LANE slices (starts
    128-aligned); gall^T [27C, T]; out^T [Cout, T]."""
    nt = N // t

    def kernel(starts_ref, idx_ref, feats_ref, w_ref, out_ref, gall_ref):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, t), 0)
        for j in range(KG):
            flat = (j * B + bi) * nt + ti
            st = starts_ref[flat]
            local0 = idx_ref[0, 0, j, :] - st            # [T]
            oh_t = local0[None, :] == iota_w             # [W, T]
            window_t = feats_ref[0, :, pl.ds(pl.multiple_of(st, 128), w)]
            g = jnp.dot(window_t, oh_t.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)  # [C, T]
            gall_ref[j * C:(j + 1) * C, :] = g.astype(jnp.bfloat16)
        out_ref[0, :, :] = jnp.dot(w_ref[0], gall_ref[:, :],
                                   preferred_element_type=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, 1, KG, t), lambda bi, ti, s1: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, N), lambda bi, ti, s1: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, COUT, KG * C), lambda bi, ti, s1: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, COUT, t), lambda bi, ti, s1: (bi, 0, ti),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((KG * C, t), jnp.bfloat16)],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, COUT, N), jnp.float32),
        grid_spec=grid_spec,
    )


def gemm_rate(m, k, n):
    rows = 100352

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:, :] = jnp.dot(a_ref[:, :], b_ref[:, :],
                              preferred_element_type=jnp.float32)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(rows, k)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(k, n)) / 60, jnp.bfloat16)
    f = jax.jit(pl.pallas_call(
        kernel,
        grid=(rows // m,),
        in_specs=[pl.BlockSpec((m, k), lambda i: (i, 0)),
                  pl.BlockSpec((k, n), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((m, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.float32)))
    dt = run(f, a, b)
    return 2 * rows * k * n / dt / 1e12


def main():
    rng = np.random.default_rng(0)
    for m, k, n in [(128, 3456, 256), (128, 3456, 512), (128, 3456, 1024),
                    (256, 3456, 256), (256, 3456, 512)]:
        try:
            r = gemm_rate(m, k, n)
            print(f"gemm M{m} K{k} N{n:5d}  {r:6.1f} TF/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"gemm M{m} K{k} N{n:5d} FAILED {str(e)[:90]}", flush=True)

    for t in (256, 512):
        w = t + 256  # lane-slice starts are 128-aligned -> more slack
        nt = N // t
        base = np.arange(N)
        idx = np.zeros((B, nt, KG, t), np.int32)
        starts = np.zeros((KG, B, nt), np.int32)
        for j in range(KG):
            shift = int(rng.integers(-40, 40))
            ix = np.clip(base + shift, 0, N - 1)
            for ti in range(nt):
                tile = ix[ti * t:(ti + 1) * t]
                st = min(max(int(tile.min()) - int(tile.min()) % 128, 0),
                         N - w)
                st -= st % 128
                starts[j, :, ti] = st
                idx[:, ti, j, :] = tile
        feats = jnp.asarray(rng.normal(size=(B, N, C)), jnp.bfloat16)
        feats_t = jnp.swapaxes(feats, 1, 2)
        wgt = jnp.asarray(rng.normal(size=(1, KG * C, COUT)) / 60,
                          jnp.bfloat16)
        wgt_t = jnp.swapaxes(wgt, 1, 2)
        starts_f = jnp.asarray(starts.reshape(-1))
        idx_t = jnp.asarray(idx)
        steps = B * nt
        for tag, call, args in (
                ("base", base_call(t, w), (starts_f, idx_t, feats, wgt)),
                ("tr  ", tr_call(t, w), (starts_f, idx_t, feats_t, wgt_t))):
            try:
                f = jax.jit(call)
                dt = run(f, *args)
                print(f"T{t} {tag} {dt*1e3:7.2f} ms  "
                      f"{dt/steps*1e6:6.2f} us/step", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"T{t} {tag} FAILED {str(e)[:110]}", flush=True)


if __name__ == "__main__":
    main()
