"""Probe 4: bisect which slab-DMA ingredient crashes the Mosaic compiler.

Cases (all grid=(4,), HBM input via pl.ANY, VMEM scratch [S, C]):
  a. static-offset DMA (ds(0, S))
  b. dynamic offset from scalar-prefetch (ds(start, S))
  c. b + @pl.when around the DMA
  d. b + SMEM scratch write/read across steps
  e. b with multiple_of hint on start
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, C, S, T = 8192, 256, 1024, 128
NST = 4


def check(name, fn):
    try:
        res = fn()
        print(f"{name:14s} OK   {res}")
    except Exception as e:  # noqa: BLE001
        msg = (str(e).splitlines() or [repr(e)])[0][:140]
        print(f"{name:14s} FAILED: {msg}")


def build(kernel, scratch_extra=()):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NST,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, T, C), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((S, C), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA] + list(scratch_extra),
    )

    @jax.jit
    def f(starts, feats):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NST, T, C), jnp.bfloat16),
            grid_spec=grid_spec,
        )(starts, feats)

    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((N, C)), jnp.bfloat16)
    starts = jnp.asarray(np.arange(NST) * 512, jnp.int32)
    out = np.asarray(f(starts, feats), np.float32)
    fnp = np.asarray(feats, np.float32)
    return out, fnp, np.asarray(starts)


def case_a():
    def kernel(starts_ref, feats_hbm, out_ref, slab, sem):
        dma = pltpu.make_async_copy(feats_hbm.at[pl.ds(0, S), :], slab, sem)
        dma.start()
        dma.wait()
        out_ref[0] = slab[0:T, :]

    out, fnp, starts = build(kernel)
    ok = np.array_equal(out, np.stack([fnp[:T]] * NST))
    return f"correct={ok}"


def case_b():
    def kernel(starts_ref, feats_hbm, out_ref, slab, sem):
        start = starts_ref[pl.program_id(0)]
        dma = pltpu.make_async_copy(
            feats_hbm.at[pl.ds(start, S), :], slab, sem)
        dma.start()
        dma.wait()
        out_ref[0] = slab[0:T, :]

    out, fnp, starts = build(kernel)
    ok = np.array_equal(out, np.stack([fnp[s:s + T] for s in starts]))
    return f"correct={ok}"


def case_c():
    def kernel(starts_ref, feats_hbm, out_ref, slab, sem):
        i = pl.program_id(0)
        start = starts_ref[i]

        @pl.when(i >= 0)
        def _():
            dma = pltpu.make_async_copy(
                feats_hbm.at[pl.ds(pl.multiple_of(start, 8), S), :], slab, sem)
            dma.start()
            dma.wait()

        out_ref[0] = slab[0:T, :]

    out, fnp, starts = build(kernel)
    ok = np.array_equal(out, np.stack([fnp[s:s + T] for s in starts]))
    return f"correct={ok}"


def case_d():
    def kernel(starts_ref, feats_hbm, out_ref, slab, sem, prev):
        i = pl.program_id(0)
        start = starts_ref[i]
        start_h = pl.multiple_of(start, 8)

        @pl.when(jnp.logical_or(i == 0, start != prev[0]))
        def _():
            dma = pltpu.make_async_copy(
                feats_hbm.at[pl.ds(start_h, S), :], slab, sem)
            dma.start()
            dma.wait()
            prev[0] = start

        out_ref[0] = slab[0:T, :]

    out, fnp, starts = build(kernel, [pltpu.SMEM((1,), jnp.int32)])
    ok = np.array_equal(out, np.stack([fnp[s:s + T] for s in starts]))
    return f"correct={ok}"


def case_e():
    def kernel(starts_ref, feats_hbm, out_ref, slab, sem):
        start = pl.multiple_of(starts_ref[pl.program_id(0)], 8)
        dma = pltpu.make_async_copy(
            feats_hbm.at[pl.ds(start, S), :], slab, sem)
        dma.start()
        dma.wait()
        out_ref[0] = slab[0:T, :]

    out, fnp, starts = build(kernel)
    ok = np.array_equal(out, np.stack([fnp[s:s + T] for s in starts]))
    return f"correct={ok}"


def main():
    for n, f in [("a-static", case_a), ("b-dynamic", case_b),
                 ("c-when", case_c), ("d-smem-prev", case_d),
                 ("e-multof", case_e)]:
        check(n, f)


if __name__ == "__main__":
    main()
