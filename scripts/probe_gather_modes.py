"""Probe: in-kernel row-gather strategies on the real TPU.

The round-2 conv kernel gathers neighbour rows with a one-hot matmul
([T, W] @ [W, C]) — W*C MACs per gathered row, which at narrow channels
(lane-padded to 128) inflates the U-Net's effective FLOPs ~2x (VERDICT r2
weak #3).  This probe measures alternatives on the chip:

  1. onehot-bf16   — round-2 baseline ([T, W] bf16 one-hot @ window)
  2. onehot-int8   — int8 one-hot @ int8 window (MXU 2x rate)
  3. take          — jnp.take(window, idx, axis=0)   (Mosaic dynamic gather?)
  4. taa           — jnp.take_along_axis(window, idx[:, None], axis=0)
  5. loop-ds       — fori_loop of per-row dynamic slices (scalar loop)

Each runs inside a minimal pallas_call shaped like the conv's inner gather
(window resident in VMEM), grid-iterated enough to dominate dispatch.
Prints ms per call and effective gathered rows/s.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, W, C = 128, 256, 128
GRID = 512  # tiles per call


def run(fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def make_inputs(dtype):
    k = jax.random.PRNGKey(0)
    win = jax.random.normal(k, (GRID, W, C), jnp.float32)
    if dtype == jnp.int8:
        win = (win * 10).astype(jnp.int8)
    else:
        win = win.astype(dtype)
    idx = jax.random.randint(jax.random.PRNGKey(1), (GRID, 8, T), 0, W,
                             dtype=jnp.int32)
    return win, idx


def bench_onehot(dtype):
    win, idx = make_inputs(dtype)

    def kernel(idx_ref, win_ref, out_ref):
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
        oh = (idx_ref[0, 0][:, None] == iota_w)
        out_ref[0] = jnp.dot(oh.astype(win_ref.dtype), win_ref[0],
                             preferred_element_type=jnp.float32
                             ).astype(out_ref.dtype)

    @jax.jit
    def f(idx, win):
        return pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((1, 8, T), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, W, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, T, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((GRID, T, C), jnp.float32),
        )(idx, win)

    return run(f, idx, win)


def bench_take(mode):
    win, idx = make_inputs(jnp.bfloat16)

    def kernel(idx_ref, win_ref, out_ref):
        w = win_ref[0]
        ix = idx_ref[0, 0]
        if mode == "take":
            g = jnp.take(w, ix, axis=0)
        elif mode == "taa":
            g = jnp.take_along_axis(
                w, jnp.broadcast_to(ix[:, None], (T, C)), axis=0)
        out_ref[0] = g.astype(out_ref.dtype)

    @jax.jit
    def f(idx, win):
        return pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((1, 8, T), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, W, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, T, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((GRID, T, C), jnp.bfloat16),
        )(idx, win)

    return run(f, idx, win)


def bench_loop_ds():
    win, idx = make_inputs(jnp.bfloat16)

    def kernel(idx_ref, win_ref, out_ref):
        def body(i, _):
            out_ref[0, i, :] = win_ref[0, idx_ref[0, 0, i], :]
            return 0
        jax.lax.fori_loop(0, T, body, 0)

    @jax.jit
    def f(idx, win):
        return pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((1, 8, T), lambda i: (i, 0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((1, W, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, T, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((GRID, T, C), jnp.bfloat16),
        )(idx, win)

    return run(f, idx, win)


def main():
    rows = []
    for name, fn in [
        ("onehot-bf16", partial(bench_onehot, jnp.bfloat16)),
        ("onehot-int8", partial(bench_onehot, jnp.int8)),
        ("take", partial(bench_take, "take")),
        ("taa", partial(bench_take, "taa")),
        ("loop-ds", bench_loop_ds),
    ]:
        try:
            dt = fn()
            rows.append((name, dt * 1e3, GRID * T / dt / 1e9))
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines() or [repr(e)]
            rows.append((name, None, msg[0][:160]))
    for name, ms, rate in rows:
        if ms is None:
            print(f"{name:14s} FAILED: {rate}")
        else:
            print(f"{name:14s} {ms:8.3f} ms   {rate:8.2f} Grow/s")


if __name__ == "__main__":
    main()
