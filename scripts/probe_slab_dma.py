"""Probe 3: slab-resident conv building blocks on the real chip.

Tests the Mosaic patterns the round-3 kernel needs:
  1. feats kept in HBM (ANY), kernel DMAs a dynamically-offset sublane
     slice [S, C] into VMEM scratch (make_async_copy with .at[pl.ds]).
  2. SMEM scratch persisting across grid steps (skip re-DMA when the slab
     start is unchanged).
  3. a per-chunk fallback DMA inside a fori_loop under @pl.when.
  4. slab DMA throughput at realistic sizes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def check(name, fn):
    try:
        res = fn()
        print(f"{name:28s} OK   {res}")
    except Exception as e:  # noqa: BLE001
        msg = (str(e).splitlines() or [repr(e)])[0][:150]
        print(f"{name:28s} FAILED: {msg}")


N, C, S, T = 32768, 384, 2048, 128


def slab_dma_basic():
    """Grid over super-tiles; DMA slab at dynamic offset; copy out rows."""
    nst = 8
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((N, C)), jnp.bfloat16)
    starts = jnp.asarray(np.arange(nst) * 1024, jnp.int32)  # 8-aligned

    def kernel(starts_ref, feats_hbm, out_ref, slab, prev, sem):
        st_i = pl.program_id(0)
        start = starts_ref[st_i]

        @pl.when(jnp.logical_or(st_i == 0, start != prev[0]))
        def _():
            dma = pltpu.make_async_copy(
                feats_hbm.at[pl.ds(pl.multiple_of(start, 8), S), :],
                slab, sem)
            dma.start()
            dma.wait()
            prev[0] = start

        out_ref[0] = slab[pl.ds(128, T), :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nst,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, T, C), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((S, C), jnp.bfloat16),
                        pltpu.SMEM((1,), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )

    @jax.jit
    def f(starts, feats):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nst, T, C), jnp.bfloat16),
            grid_spec=grid_spec,
        )(starts, feats)

    out = np.asarray(f(starts, feats), np.float32)
    ref = np.stack([np.asarray(feats, np.float32)[s + 128:s + 128 + T]
                    for s in np.asarray(starts)])
    return f"correct={np.array_equal(out, ref)}"


def chunk_dma_in_loop():
    """Fallback: per-chunk DMA inside fori_loop under pl.when."""
    nst = 4
    w = 256
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((N, C)), jnp.bfloat16)
    starts = jnp.asarray(np.arange(nst) * 512, jnp.int32)
    nchunks = jnp.asarray([1, 2, 3, 2], jnp.int32)

    def kernel(starts_ref, nch_ref, feats_hbm, out_ref, win, sem, acc):
        st_i = pl.program_id(0)
        start = starts_ref[st_i]
        nch = nch_ref[st_i]
        acc[:] = jnp.zeros_like(acc)

        @pl.when(nch > 0)
        def _():
            def body(ci, carry):
                dma = pltpu.make_async_copy(
                    feats_hbm.at[pl.ds(
                        pl.multiple_of(start + ci * w, 8), w), :], win, sem)
                dma.start()
                dma.wait()
                acc[:] = acc[:] + win[pl.ds(0, T), :].astype(jnp.float32)
                return carry

            jax.lax.fori_loop(0, nch, body, 0)

        out_ref[0] = acc[:].astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nst,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, T, C), lambda i, s1, s2: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((w, C), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA,
                        pltpu.VMEM((T, C), jnp.float32)],
    )

    @jax.jit
    def f(starts, nchunks, feats):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nst, T, C), jnp.bfloat16),
            grid_spec=grid_spec,
        )(starts, nchunks, feats)

    out = np.asarray(f(starts, nchunks, feats), np.float32)
    fnp = np.asarray(feats, np.float32)
    ref = np.stack([
        sum(fnp[s + ci * w:s + ci * w + T]
            for ci in range(int(nc))).astype(np.float32)
        for s, nc in zip(np.asarray(starts), np.asarray(nchunks))])
    ok = np.allclose(out, ref.astype(np.dtype("bfloat16")).astype(np.float32),
                     atol=2e-1)
    return f"correct={ok}"


def slab_throughput():
    """Slab DMA rate: per-super-tile fresh slab, no compute."""
    nst = 256
    feats = jnp.zeros((N, C), jnp.bfloat16)
    starts = jnp.asarray((np.arange(nst) * 64) % (N - S), jnp.int32)
    starts = (starts // 8) * 8

    def kernel(starts_ref, feats_hbm, out_ref, slab, sem):
        st_i = pl.program_id(0)
        start = starts_ref[st_i]
        dma = pltpu.make_async_copy(
            feats_hbm.at[pl.ds(pl.multiple_of(start, 8), S), :], slab, sem)
        dma.start()
        dma.wait()
        out_ref[0] = jnp.sum(slab[0:8, :], dtype=jnp.float32,
                             axis=0, keepdims=True) * jnp.ones(
            (8, 1), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nst,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 8, C), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((S, C), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
    )

    @jax.jit
    def f(starts, feats):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nst, 8, C), jnp.float32),
            grid_spec=grid_spec,
        )(starts, feats)

    out = jax.block_until_ready(f(starts, feats))
    jax.device_get(out.ravel()[0])
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        out = f(starts, feats)
    jax.device_get(out.ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    gb = nst * S * C * 2 / 1e9
    return f"{dt*1e3:.3f} ms for {gb:.2f} GB -> {gb/dt:.0f} GB/s"


def main():
    check("slab-dma-basic", slab_dma_basic)
    check("chunk-dma-in-loop", chunk_dma_in_loop)
    check("slab-throughput", slab_throughput)


if __name__ == "__main__":
    main()
