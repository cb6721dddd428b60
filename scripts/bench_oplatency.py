"""Clean probe: in-program op latency + gather rate on the real chip.

MUST run alone on the TPU (concurrent TPU processes time-slice the chip
and contaminated every earlier round of measurements).

Questions answered:
 1. dispatch floor (trivial program)
 2. does a serial chain of K ops inside one program pay per-op latency?
    (scan vs unrolled vs ONE fused einsum, identical arithmetic)
 3. XLA gather rate (rows/s) at conv-relevant shapes
 4. the real sparse-conv formulations head-to-head at L0/L1/L3 shapes:
    scan-of-27 (round-1) vs single-gather einsum vs gather-free floor
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

B, K = 8, 27


def timeit(fn, args, n=20):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n


def main():
    dev = jax.devices()[0]
    print(f"# {dev.platform} {getattr(dev, 'device_kind', '')}")
    rng = np.random.default_rng(0)

    # 1. dispatch floor
    x0 = jnp.float32(1.0)
    f0 = jax.jit(lambda x: x + 1)
    print(f"dispatch floor:          {timeit(f0, (x0,))*1e3:8.3f} ms")

    # 2. serial-chain op latency: y = x @ w1 @ w2 ... @ w27 (small matmuls)
    m, c = 4096, 128
    x = jnp.asarray(rng.normal(size=(m, c)) * 0.05, jnp.bfloat16)
    ws = jnp.asarray(rng.normal(size=(K, c, c)) * (1 / np.sqrt(c)),
                     jnp.bfloat16)

    @jax.jit
    def chain_scan(x, ws):
        def body(h, w):
            return jnp.dot(h, w, preferred_element_type=jnp.float32
                           ).astype(h.dtype), None
        h, _ = jax.lax.scan(body, x, ws)
        return h

    @jax.jit
    def chain_unrolled(x, ws):
        h = x
        for k in range(K):
            h = jnp.dot(h, ws[k], preferred_element_type=jnp.float32
                        ).astype(h.dtype)
        return h

    t_scan = timeit(chain_scan, (x, ws))
    t_unrl = timeit(chain_unrolled, (x, ws))
    print(f"27-op serial chain scan: {t_scan*1e3:8.3f} ms "
          f"({t_scan/K*1e6:6.1f} us/op)")
    print(f"27-op serial chain unrl: {t_unrl*1e3:8.3f} ms "
          f"({t_unrl/K*1e6:6.1f} us/op)")

    # 3. gather rate: one take_along_axis at conv shapes
    for n, cin in [(6144, 32), (3072, 64), (768, 256)]:
        feats = jnp.asarray(rng.normal(size=(B, n, cin)), jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, n, size=(B, K * n)), jnp.int32)
        g = jax.jit(lambda f, i: jnp.take_along_axis(f, i[..., None], axis=1))
        dt = timeit(g, (feats, idx))
        rows = B * K * n
        print(f"gather [{n}x{cin}] {rows/1e6:4.2f}M rows: {dt*1e3:8.3f} ms "
              f"({dt/rows*1e9:5.1f} ns/row, "
              f"{rows*cin*2/dt/1e9:6.1f} GB/s)")

    # 4. conv formulations
    for n, cin, cout in [(6144, 32, 32), (3072, 64, 64), (768, 256, 256)]:
        feats = jnp.asarray(rng.normal(size=(B, n, cin)), jnp.bfloat16)
        idx = jnp.asarray(
            np.sort(rng.integers(0, n, size=(K, B, n)), axis=-1), jnp.int32)
        hit = jnp.asarray(rng.random((K, B, n)) < 0.7)
        w = jnp.asarray(rng.normal(size=(K, cin, cout)) / cin, jnp.bfloat16)

        @jax.jit
        def conv_scan(feats, idx, hit, w):
            def step(acc, inp):
                wk, i, h = inp
                g = jnp.take_along_axis(feats, i[..., None], axis=1)
                g = jnp.where(h[..., None], g, 0)
                return acc + jnp.einsum("bnc,cd->bnd", g, wk,
                                        preferred_element_type=jnp.float32), None
            init = jnp.zeros((B, idx.shape[2], w.shape[-1]), jnp.float32)
            out, _ = jax.lax.scan(step, init, (w, idx, hit))
            return out

        @jax.jit
        def conv_fused(feats, idx, hit, w):
            kk, b, nn = idx.shape
            big = idx.transpose(1, 0, 2).reshape(b, kk * nn)
            g = jnp.take_along_axis(feats, big[..., None], axis=1)
            g = g.reshape(b, kk, nn, -1)
            g = jnp.where(hit.transpose(1, 0, 2)[..., None], g, 0)
            return jnp.einsum("bknc,kcd->bnd", g, w,
                              preferred_element_type=jnp.float32)

        @jax.jit
        def conv_floor(feats, idx, hit, w):
            return jnp.einsum("bnc,kcd->bnd", feats, w,
                              preferred_element_type=jnp.float32)

        t1 = timeit(conv_scan, (feats, idx, hit, w))
        t2 = timeit(conv_fused, (feats, idx, hit, w))
        t3 = timeit(conv_floor, (feats, idx, hit, w))
        print(f"conv N={n} C={cin}: scan27 {t1*1e3:7.2f} ms | fused "
              f"{t2*1e3:7.2f} ms | no-gather floor {t3*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
