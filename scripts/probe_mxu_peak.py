"""What dot rate can ONE Pallas kernel reach on this chip?

gemm-only in probe_dot_overhead runs [256,3456]x[3456,128] at ~28 TF/s =
one 128-row MXU pass per 128 cycles.  Is that the per-kernel ceiling, or
do bigger/better-shaped dots engage more MXU throughput?  Compares the
same shapes in XLA (jnp.dot).  Marginal timing: X copies chained inside
ONE jit minus the 1-copy program, so the ~2 ms tunnel dispatch floor
cancels (the naive per-call version measured 0.1-4 TF/s for everything).

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

REPS = 17


def run(fn, *args, iters=5):
    out = fn(*args)
    jax.device_get(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(out.ravel()[0])
    return (time.perf_counter() - t0) / iters


def pallas_matmul(m, k, n, bm, bn):
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
        ("step-shape ", 256, 3456, 128, 256, 128),
        ("tall       ", 4096, 3456, 128, 512, 128),
        ("wide-out   ", 256, 3456, 512, 256, 512),
        ("sq-2048    ", 2048, 2048, 2048, 512, 512),
        ("sq-1blk    ", 1024, 1024, 1024, 1024, 1024),
    ]
    for name, m, k, n, bm, bn in cases:
        a = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(k, n)) / 60, jnp.bfloat16)
        fl = 2 * m * k * n

        def chain_p(a, b, x):
            pc = pallas_matmul(m, k, n, bm, bn)
            o = None
            for i in range(x):
                r = pc(a * (1.0 + i * 1e-6), b)
                o = r if o is None else o + r
            return o

        def chain_x(a, b, x):
            o = None
            for i in range(x):
                r = jnp.dot(a * (1.0 + i * 1e-6), b,
                            preferred_element_type=jnp.float32)
                o = r if o is None else o + r
            return o

        row = f"{name} [{m}x{k}x{n}]"
        for tag, chain in (("pallas", chain_p), ("xla", chain_x)):
            try:
                f1 = jax.jit(functools.partial(chain, x=1))
                fx = jax.jit(functools.partial(chain, x=REPS))
                t1 = run(f1, a, b)
                tx = run(fx, a, b)
                marg = (tx - t1) / (REPS - 1)
                row += f"   {tag} {fl/marg/1e12:7.1f} TF/s"
            except Exception as e:  # noqa: BLE001
                row += f"   {tag} FAILED {str(e)[:60]}"
        print(row, flush=True)


if __name__ == "__main__":
    main()
