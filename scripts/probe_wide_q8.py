"""Probe: int8 conv width configs at the c384 decoder shape (the wall).

The column-tile law ([*, K] x [K, N]: N=128 ~25 TF/s, 256 ~39, 512 ~67,
1024 ~99 on this chip) makes the gather/GEMM output width the binding
axis.  The default int8 plan at c=384 runs c_g=256 / n_cg=2 (the 6912
weight-lane budget binds).  This probe measures, per conv call at the
bench L0 decoder shape:

  a. default plan            (c_g=256, n_cg=2, t=256)
  b. MRCC_KG_LANES_Q8=10368  (c_g=384, n_cg=1, kg=27, t=256) — VMEM edge
  c. b at t=128              (smaller gall scratch, w=t+64 windows)
  d. bf16 reference          (c_g=128, n_cg=3)

Timing is marginal (X chained calls minus 1-call program) per the
round-3 measurement discipline.  Run alone on the TPU:
  python scripts/probe_wide_q8.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

B, N, C, COUT, K = 2, 12544, 384, 384, 27
REPS = 8


def tiled_maps(n, t):
    from mrcc_tpu.ops.conv_pallas import build_tiled_maps

    rng = np.random.default_rng(0)
    base = np.arange(n)
    idx = np.zeros((K, B, n), np.int32)
    for ki in range(K):
        shift = rng.integers(-40, 40)
        idx[ki] = np.sort(np.clip(base + shift, 0, n - 1))
    hit = rng.random((K, B, n)) < 0.82
    return build_tiled_maps(jnp.asarray(idx), jnp.asarray(hit), n, t=t)


def marginal(tag, fn, feats, w, tiled, valid):
    """Marginal per-call time: REPS chained calls minus one call."""

    def chain(reps):
        @jax.jit
        def run(f):
            out = None
            for r in range(reps):
                y = fn(f, w * (1 + r * 1e-6), tiled, valid, k=K)
                out = y if out is None else out + y
            return out.sum()

        return run

    r1, rx = chain(1), chain(REPS)
    for r in (r1, rx):
        jax.device_get(r(feats))  # compile+warm
    t0 = time.perf_counter()
    jax.device_get(r1(feats))
    t1 = time.perf_counter()
    jax.device_get(rx(feats))
    t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / (REPS - 1)
    flops = 2 * B * N * (K * C) * COUT
    print(f"{tag:34s} {per * 1e3:8.2f} ms/conv   "
          f"{flops / per / 1e12:6.1f} TF/s (GEMM-only FLOPs)", flush=True)


def main():
    assert jax.devices()[0].platform != "cpu", "run on the TPU"
    from mrcc_tpu.ops import conv_pallas as cp

    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(B, N, C)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(K, C, COUT)) / 20, jnp.float32)
    valid = jnp.ones((B, N), bool)

    t256 = tiled_maps(N, 256)
    t128 = tiled_maps(N, 128)

    for tag, fn, tiled, env in (
            ("a. q8 default c_g=256 n_cg=2 t256",
             cp.gather_gemm_conv_tiled_q8, t256, None),
            ("b. q8 WIDE c_g=384 n_cg=1 t256",
             cp.gather_gemm_conv_tiled_q8, t256, "10368"),
            ("c. q8 WIDE c_g=384 n_cg=1 t128",
             cp.gather_gemm_conv_tiled_q8, t128, "10368"),
            ("d. bf16 c_g=128 n_cg=3 t256",
             cp.gather_gemm_conv_tiled, t256, None),
    ):
        if env is None:
            os.environ.pop("MRCC_KG_LANES_Q8", None)
        else:
            os.environ["MRCC_KG_LANES_Q8"] = env
        try:
            marginal(tag, fn, feats, w, tiled, valid)
        except Exception as e:  # noqa: BLE001 — probe: report and continue
            msg = (str(e).splitlines() or [repr(e)])[0][:140]
            print(f"{tag:34s} FAILED: {msg}", flush=True)
    os.environ.pop("MRCC_KG_LANES_Q8", None)


if __name__ == "__main__":
    main()
