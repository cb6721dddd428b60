#!/usr/bin/env python3
"""One-command on-chip validation of the round-3 kernel changes.

Order matters: cheapest first, so a compile failure pinpoints the layer.
  1. certify_kernels (bench.py): rank + bf16 conv + int8 conv vs XLA,
     at shapes that ENGAGE the new plan (pack=2 at c=48/n=512).
  2. Forced lane-pack oracle at production-style shapes (pack=4, c=128).
  3. VJP grads on-chip (packed + unpacked) vs XLA autodiff.
  4. The c=96 -> 128 padded plan at bench L0 shape.

Run alone on the TPU:  python scripts/validate_on_tpu.py
Escape hatch if any step fails: export MRCC_CONV_PLAN=plain.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    assert jax.devices()[0].platform != "cpu", "run on the TPU"
    import mrcc_tpu

    mrcc_tpu.enable_compilation_cache()
    from bench import certify_kernels

    certify_kernels()
    print("1/4 certify_kernels OK", flush=True)

    from mrcc_tpu.ops import conv_pallas as cp
    from mrcc_tpu.sparse.conv import conv_kernel_map

    rng = np.random.default_rng(0)

    def monotone(k, b, n):
        idx = np.zeros((k, b, n), np.int32)
        base = np.arange(n)
        for ki in range(k):
            shift = rng.integers(-n // 4, n // 4)
            idx[ki] = np.sort(np.clip(base + shift, 0, n - 1))
        hit = rng.random((k, b, n)) < 0.7
        return jnp.asarray(idx), jnp.asarray(hit)

    def check(tag, n, cin, cout, dtype, tol):
        k, b = 27, 2
        feats = jnp.asarray(rng.normal(size=(b, n, cin)), dtype)
        idx, hit = monotone(k, b, n)
        w = jnp.asarray(rng.normal(size=(k, cin, cout)) / np.sqrt(cin),
                        jnp.float32)
        valid = jnp.ones((b, n), bool)
        plan = cp._split_plan(n, cin, k, 32,
                              jnp.dtype(dtype).itemsize)
        want = np.asarray(conv_kernel_map(feats.astype(jnp.float32), w,
                                          idx, hit, valid))
        got = np.asarray(cp.gather_gemm_conv(
            feats, w.astype(dtype) if dtype != jnp.float32 else w,
            idx, hit, valid)).astype(np.float32)
        err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
        print(f"  {tag}: plan={plan} rel_err={err:.5f}", flush=True)
        assert err < tol, (tag, err)

    # 2. packed shapes the production profile hits (pack engages on TPU)
    check("pack4 c=32 n=12544", 12544, 32, 32, jnp.bfloat16, 3e-2)
    check("pack2 c=64 n=12544", 12544, 64, 64, jnp.bfloat16, 3e-2)
    # production-scale forced pack (over budget at the 128-lane floor)
    check("prod pack c=128 n=40960", 40960, 128, 96, jnp.bfloat16, 3e-2)
    print("2/4 packed forward oracles OK", flush=True)

    # 3. grads: packed dW on-chip vs XLA autodiff
    k, b, n, cin, cout = 27, 1, 12544, 32, 32
    idx, hit = monotone(k, b, n)
    feats = jnp.asarray(rng.normal(size=(b, n, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, cin, cout)) / 6, jnp.float32)
    valid = jnp.ones((b, n), bool)
    g = jnp.asarray(rng.normal(size=(b, n, cout)), jnp.float32)
    tiled = cp.build_tiled_maps(idx, hit, n)

    def loss_xla(w):
        return (conv_kernel_map(feats, w, idx, hit, valid) * g).sum()

    dw_want = np.asarray(jax.grad(loss_xla)(w))
    dw_got = np.asarray(cp.dw_gather_gemm(feats.astype(jnp.bfloat16),
                                          g.astype(jnp.bfloat16),
                                          tiled, k, cin=cin))
    rel = (np.abs(dw_got - dw_want).max()
           / max(np.abs(dw_want).max(), 1e-9))
    print(f"  dW rel_err={rel:.5f}", flush=True)
    assert rel < 3e-2
    print("3/4 packed dW OK", flush=True)

    # 4. padded c=96 plan at the bench L0 shape
    check("pad c=96 n=12544", 12544, 96, 96, jnp.bfloat16, 3e-2)
    print("4/4 padded c=96 OK — all on-chip validations passed", flush=True)


if __name__ == "__main__":
    main()
