"""What dot rate can ONE Pallas kernel reach on this chip?

gemm-only in probe_dot_overhead runs [256,3456]x[3456,128] at ~28 TF/s =
one 128-row MXU pass per 128 cycles.  Is that the per-kernel ceiling, or
do bigger/better-shaped dots engage more MXU throughput?  Compares the
same shapes in XLA (jnp.dot under jit).

Run alone on the TPU:  python scripts/probe_mxu_peak.py
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


def run(fn, *args, iters=10):
    out = fn(*args)
    jax.device_get(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(out.ravel()[0])
    return (time.perf_counter() - t0) / iters


def pallas_matmul(m, k, n, bm, bn, dtype):
    def kernel(a_ref, b_ref, o_ref):
        o_ref[:, :] = jnp.dot(a_ref[:, :], b_ref[:, :],
                              preferred_element_type=jnp.float32)

    return pl.pallas_call(
        kernel,
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
    )


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)
    cases = [
        # (m, k, n, bm, bn)
        ("step-shape   ", 256, 3456, 128, 256, 128),
        ("tall         ", 4096, 3456, 128, 512, 128),
        ("wide-out     ", 256, 3456, 512, 256, 512),
        ("square-big   ", 2048, 2048, 2048, 512, 512),
        ("square-1blk  ", 1024, 1024, 1024, 1024, 1024),
    ]
    for name, m, k, n, bm, bn in cases:
        a = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(k, n)) / 60, jnp.bfloat16)
        fl = 2 * m * k * n
        try:
            f = jax.jit(pallas_matmul(m, k, n, bm, bn, jnp.bfloat16))
            dt = run(f, a, b)
            r = fl / dt / 1e12
        except Exception as e:  # noqa: BLE001
            print(f"{name} PALLAS FAILED {str(e)[:90]}")
            r = float("nan")
        fx = jax.jit(lambda a, b: jnp.dot(a, b,
                                          preferred_element_type=jnp.float32))
        dtx = run(fx, a, b)
        rx = fl / dtx / 1e12
        print(f"{name} [{m}x{k}x{n}] pallas {r:7.1f} TF/s   xla {rx:7.1f} TF/s")


if __name__ == "__main__":
    main()
