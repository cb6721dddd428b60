"""Sweep tile/window sizes of the Pallas conv at real U-Net level shapes.

Run alone on the TPU:  python scripts/bench_conv_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from mrcc_tpu.ops.conv_pallas import gather_gemm_conv

B = 8
# (name, K, N, Cin, Cout) — seg U-Net @ cap 6144 incl. decoder cat widths
SHAPES = [
    ("stem", 27, 6144, 3, 32),
    ("enc-L1", 27, 3072, 64, 64),
    ("enc-L2", 27, 1536, 128, 128),
    ("enc-L3", 27, 768, 256, 256),
    ("bottom", 27, 384, 384, 384),
    ("dec-L3cat", 27, 768, 640, 384),
    ("dec-L1cat", 27, 3072, 448, 384),
    ("dec-L0cat", 27, 6144, 416, 384),
    ("down-L0", 8, 3072, 32, 64),
]


def monotone(rng, k, n):
    base = np.arange(n)
    idx = np.zeros((k, B, n), np.int32)
    for ki in range(k):
        shift = rng.integers(-n // 8, n // 8)
        for b in range(B):
            idx[ki, b] = np.sort(np.clip(
                base + shift + rng.integers(-8, 8, size=n), 0, n - 1))
    hit = rng.random((k, B, n)) < 0.7
    return jnp.asarray(idx), jnp.asarray(hit)


def timeit(fn, args, iters=10):
    out = fn(*args)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    total = {}
    for t, w in [(128, 256), (256, 256), (256, 512), (128, 512)]:
        tot = 0.0
        print(f"\n== T={t} W={w}")
        for name, k, n, cin, cout in SHAPES:
            feats = jnp.asarray(rng.normal(size=(B, n, cin)), jnp.bfloat16)
            idx, hit = monotone(rng, k, n)
            wgt = jnp.asarray(rng.normal(size=(k, cin, cout)) / cin,
                              jnp.float32)
            valid = jnp.ones((B, n), bool)

            fn = jax.jit(lambda f, i, h, ww: gather_gemm_conv(
                f, ww, i, h, valid, t=min(t, n), w_width=min(w, n)))
            try:
                dt = timeit(fn, (feats, idx, hit, wgt))
                gf = 2 * k * B * n * cin * cout / 1e9
                print(f"  {name:11s} {dt*1e3:8.2f} ms  ({gf:6.1f} GF, "
                      f"{gf/dt/1e3:5.2f} TF/s)")
                tot += dt
            except Exception as e:  # noqa: BLE001
                print(f"  {name:11s} FAILED {str(e)[:80]}")
                tot += 1.0
        total[(t, w)] = tot
        print(f"  {'TOTAL':11s} {tot*1e3:8.2f} ms")
    best = min(total, key=total.get)
    print(f"\nbest (T, W) = {best}  {total[best]*1e3:.2f} ms")


if __name__ == "__main__":
    main()
