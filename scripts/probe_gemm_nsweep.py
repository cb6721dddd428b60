"""Does Pallas dot throughput scale with output-column tiles (N)?

probe_gemm_shape: M-scaling gives nothing (K3456 N128: ~24-28 TF/s at any
M); sq-2048 (M,N = 512) reaches ~240 TF/s.  If N-tiles are the parallel
axis, a TRANSPOSED conv kernel (out^T = W^T @ gall^T, N = tile rows)
unlocks it.  Also re-measures K alignment (2592 = 27*96 vs 2688 padded).

Run alone on the TPU:  python scripts/probe_gemm_nsweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

ROWS = 100352


def run(fn, *args, iters=10):
    out = fn(*args)
    jax.device_get(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(out.ravel()[0])
    return (time.perf_counter() - t0) / iters


def gemm_grid(m, k, n):
    def kernel(a_ref, b_ref, o_ref):
        o_ref[:, :] = jnp.dot(a_ref[:, :], b_ref[:, :],
                              preferred_element_type=jnp.float32)

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
    cases = [
        # N sweep at the conv GEMM's M/K
        (256, 3456, 128), (256, 3456, 256), (256, 3456, 512),
        (1024, 3456, 512),
        # K alignment: 27*96 vs padded
        (256, 2592, 128), (256, 2688, 128),
        # transposed-kernel candidate: M=Cout=128, K=3456, N=T
        (128, 3456, 256), (128, 3456, 512), (128, 3456, 1024),
        # gather-dot candidate transposed: M=C=128, K=W=384, N=T
        (128, 384, 256), (128, 384, 512), (256, 384, 128),
    ]
    for m, k, n in cases:
        a = jnp.asarray(rng.normal(size=(ROWS, k)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(k, n)) / 60, jnp.bfloat16)
        fl = 2 * ROWS * k * n
        try:
            f = jax.jit(gemm_grid(m, k, n))
            dt = run(f, a, b)
        except Exception as e:  # noqa: BLE001
            print(f"M{m:5d} K{k} N{n:4d} FAILED {str(e)[:90]}", flush=True)
            continue
        steps = ROWS // m
        print(f"M{m:5d} K{k} N{n:4d}  {dt*1e3:7.2f} ms  "
              f"{fl/dt/1e12:6.1f} TF/s  {dt/steps*1e6:7.2f} us/step",
              flush=True)


if __name__ == "__main__":
    main()
