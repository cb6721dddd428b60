"""Per-step GEMM rate vs block height M inside a Pallas grid.

The conv kernel's [256, 27C] x [27C, Cout] GEMM measures ~28 TF/s while a
[512x512]-blocked square Pallas matmul reaches ~240 TF/s (probe_mxu_peak)
— hypothesis: per-dot throughput scales with independent output tiles, so
batching MORE OUTPUT ROWS per grid step should lift the conv kernel's
dominant cost (probe_dot_overhead: the GEMM is 8 us of the 12 us step).

Sweeps M in {256, 512, 1024, 2048} over the same 100352 total rows, for
K in {2592 (c96 class), 3456 (c128)} x Cout in {128}, bf16 and int8.

Run alone on the TPU:  python scripts/probe_gemm_shape.py
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

ROWS = 100352  # 8 * 12544: the bench L0 total


def run(fn, *args, iters=10):
    out = fn(*args)
    jax.device_get(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(out.ravel()[0])
    return (time.perf_counter() - t0) / iters


def gemm_grid(m, k, n, dtype):
    acc_t = jnp.int32 if dtype == jnp.int8 else jnp.float32

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:, :] = jnp.dot(a_ref[:, :], b_ref[:, :],
                              preferred_element_type=acc_t
                              ).astype(jnp.float32)

    steps = ROWS // m
    return pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((ROWS, n), jnp.float32),
    )


def main():
    rng = np.random.default_rng(0)
    for dtype, tag in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
        for k in (2592, 3456):
            for m in (256, 512, 1024, 2048):
                n = 128
                if dtype == jnp.int8:
                    a = jnp.asarray(rng.integers(-90, 90, (ROWS, k)), dtype)
                    b = jnp.asarray(rng.integers(-20, 20, (k, n)), dtype)
                else:
                    a = jnp.asarray(rng.normal(size=(ROWS, k)), dtype)
                    b = jnp.asarray(rng.normal(size=(k, n)) / 60, dtype)
                fl = 2 * ROWS * k * n
                try:
                    f = jax.jit(gemm_grid(m, k, n, dtype))
                    dt = run(f, a, b)
                except Exception as e:  # noqa: BLE001
                    print(f"{tag} K{k} M{m:5d} FAILED {str(e)[:90]}")
                    continue
                steps = ROWS // m
                print(f"{tag} K{k} M{m:5d}  {dt*1e3:7.2f} ms  "
                      f"{fl/dt/1e12:6.1f} TF/s  {dt/steps*1e6:6.2f} us/step",
                      flush=True)


if __name__ == "__main__":
    main()
