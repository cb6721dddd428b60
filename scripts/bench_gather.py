"""Microbenchmark: sparse-conv gather strategies on TPU.

The round-1 wall: XLA row-gathers run ~10 ns/row (~100x off HBM roofline),
bounding every sparse conv (27 gathers each).  This probe measures, at
representative U-Net level shapes, the candidate replacements:

  S1  take_along_axis (current conv path)          [XLA gather]
  S2  full one-hot matmul                          [MXU, N_in-wide]
  S4  pallas: whole table in VMEM, windowed one-hot matmul per offset
      (exploits monotone nbr_idx; per-tile window starts scalar-prefetched)
  S6  the conv GEMM alone (floor)

All timing runs REPS iterations INSIDE one jit program (per-dispatch
overhead on the tunneled backend is ~10 ms — naive per-call timing measures
the tunnel, not the chip).  Completion forced via jax.device_get.

Run:  python scripts/bench_gather.py [LEVEL ...]
"""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# level shapes: (N_in, Cin, Cout) at B=8, K=27
LEVELS = {
    "L0": (6144, 32, 32),
    "L1": (3072, 64, 64),
    "L2": (1536, 128, 128),
    "L3": (768, 256, 256),
    "dec": (3072, 96, 96),
}
B, K = 8, 27
REPS = 20


def make_inputs(n, cin, seed=0):
    """Synthetic monotone kernel-map: idx[k] non-decreasing with local
    jitter spans like real sorted-key neighbour tables."""
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(B, n, cin)).astype(np.float32)
    idx = np.zeros((K, B, n), np.int32)
    hit = rng.random((K, B, n)) < 0.7
    base = np.arange(n)
    for k in range(K):
        shift = rng.integers(-n // 8, n // 8)
        jitter = rng.integers(-8, 8, size=n)
        for b in range(B):
            v = np.clip(base + shift + jitter, 0, n - 1)
            idx[k, b] = np.sort(v)  # monotone like searchsorted output
    return feats, jnp.asarray(idx), jnp.asarray(hit)


def bench(core, feats, idx, hit, w):
    """Throughput timing: queue REPS independent dispatches, sync once
    (the bench.py pattern).

    In-jit serial chaining is NOT usable on this backend (dependent ops pay
    a ~1.9 ms serialization penalty regardless of size), and scalar-carry
    chaining lets XLA dead-code-eliminate the computation — queued
    independent dispatches overlap host dispatch (~5 ms) with device work
    and measure what the engine actually experiences.
    """
    fn = jax.jit(core)
    out = fn(feats, idx, hit, w)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(feats, idx, hit, w)
    jax.device_get(out)
    return (time.perf_counter() - t0) / REPS


# ---------------------------------------------------------------- S1
def s1_take(feats, idx, hit, w):
    def step(acc, inp):
        wk, i, h = inp
        g = jnp.take_along_axis(feats, i[..., None], axis=1)
        g = jnp.where(h[..., None], g, 0)
        return acc + jnp.einsum("bnc,cd->bnd", g, wk,
                                preferred_element_type=jnp.float32), None

    init = jnp.zeros((B, idx.shape[2], w.shape[-1]), jnp.float32)
    out, _ = jax.lax.scan(step, init, (w.astype(feats.dtype), idx, hit))
    return out


# ---------------------------------------------------------------- S2
def s2_onehot(feats, idx, hit, w):
    n = feats.shape[1]

    def step(acc, inp):
        wk, i, h = inp
        oh = (i[..., None] == jnp.arange(n)[None, None, :])
        oh = jnp.where(h[..., None], oh, False).astype(feats.dtype)
        g = jnp.einsum("bmn,bnc->bmc", oh, feats,
                       preferred_element_type=jnp.float32).astype(feats.dtype)
        return acc + jnp.einsum("bnc,cd->bnd", g, wk,
                                preferred_element_type=jnp.float32), None

    init = jnp.zeros((B, idx.shape[2], w.shape[-1]), jnp.float32)
    out, _ = jax.lax.scan(step, init, (w.astype(feats.dtype), idx, hit))
    return out


# ---------------------------------------------------------------- S4
KP = 32  # K padded to a sublane multiple for Pallas block shapes


def make_s4(n, cin, cout, t=128, win=512):
    n_t = n // t

    def kernel(starts_ref, idx_ref, hit_ref, feats_ref, w_ref, out_ref):
        b = pl.program_id(0)
        ti = pl.program_id(1)
        acc = jnp.zeros((t, cout), jnp.float32)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (t, win), 1)
        for k in range(K):
            st = pl.multiple_of(starts_ref[k * B * n_t + b * n_t + ti], 8)
            window = feats_ref[0, pl.ds(st, win), :]
            local = idx_ref[0, 0, k, :] - st
            h = hit_ref[0, 0, k, :]
            oh = ((local[:, None] == iota_w) & (h[:, None] != 0)
                  ).astype(window.dtype)
            g = jnp.dot(oh, window, preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(g.astype(w_ref.dtype), w_ref[k],
                                preferred_element_type=jnp.float32)
        out_ref[0, :, :] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec((1, 1, KP, t), lambda b, ti, starts: (b, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KP, t), lambda b, ti, starts: (b, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cin), lambda b, ti, starts: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KP, cin, cout), lambda b, ti, starts: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, cout), lambda b, ti, starts: (b, ti, 0),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, n, cout), jnp.float32),
        grid_spec=grid_spec,
    )

    def core(feats, idx, hit, w):
        # per (k, b, tile) window start: aligned down to 8, clamped to fit
        starts = idx[:, :, ::t]
        starts = jnp.minimum(starts - (starts % 8), n - win).astype(jnp.int32)
        # [K, B, N] -> [B, n_t, KP, t] (sublane-friendly block layout)
        def to_tiles(a):
            a = a.reshape(K, B, n_t, t).transpose(1, 2, 0, 3)
            return jnp.pad(a, ((0, 0), (0, 0), (0, KP - K), (0, 0)))

        return call(starts.reshape(-1), to_tiles(idx),
                    to_tiles(hit.astype(jnp.int32)), feats,
                    jnp.pad(w, ((0, KP - K), (0, 0), (0, 0))
                            ).astype(feats.dtype))

    return core


# ---------------------------------------------------------------- S7
def s7_bigtake(feats, idx, hit, w):
    """ONE gather + ONE fused GEMM for all 27 offsets (minimal op count)."""
    k, b, n = idx.shape
    big = idx.transpose(1, 0, 2).reshape(b, k * n)
    g = jnp.take_along_axis(feats, big[..., None], axis=1)  # [B, K*N, C]
    g = g.reshape(b, k, n, -1)
    g = jnp.where(hit.transpose(1, 0, 2)[..., None], g, 0)
    return jnp.einsum("bknc,kcd->bnd", g, w.astype(feats.dtype),
                      preferred_element_type=jnp.float32)


# ---------------------------------------------------------------- S6
def s6_gemm_floor(feats, idx, hit, w):
    def step(acc, wk):
        return acc + jnp.einsum("bnc,cd->bnd", feats, wk,
                                preferred_element_type=jnp.float32), None

    init = jnp.zeros((B, feats.shape[1], w.shape[-1]), jnp.float32)
    out, _ = jax.lax.scan(step, init, w.astype(feats.dtype))
    return out


def main():
    names = sys.argv[1:] or list(LEVELS)
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '')} "
          f"reps={REPS}")
    for name in names:
        n, cin, cout = LEVELS[name]
        feats, idx, hit = make_inputs(n, cin)
        w = jnp.asarray(
            np.random.default_rng(1).normal(size=(K, cin, cout)) / cin,
            jnp.float32)
        rows = K * B * n
        gemm_gflop = 2 * rows * cin * cout / 1e9
        feats_bf = jnp.asarray(feats, jnp.bfloat16)
        strategies = [
            ("S1_take_f32", s1_take, jnp.asarray(feats)),
            ("S1_take_bf16", s1_take, feats_bf),
            ("S2_onehot_bf16", s2_onehot, feats_bf),
            ("S4_pallas_win_bf16", make_s4(n, cin, cout), feats_bf),
            ("S6_gemm_floor_bf16", s6_gemm_floor, feats_bf),
            ("S7_bigtake_bf16", s7_bigtake, feats_bf),
            ("S7_bigtake_f32", s7_bigtake, jnp.asarray(feats)),
        ]
        print(f"\n== {name}: N={n} Cin={cin} Cout={cout} B={B} K={K} "
              f"({rows/1e6:.2f}M rows, {gemm_gflop:.1f} GEMM-GFLOP/conv)")
        ref = None
        for label, fn, f in strategies:
            try:
                out = np.asarray(jax.jit(fn)(f, idx, hit, w), np.float32)
                if ref is None:
                    ref = out
                err = float(np.abs(out - ref).max())
                dt = bench(fn, f, idx, hit, w)
                print(f"  {label:22s} {dt*1e3:8.3f} ms  "
                      f"{rows/dt/1e9:7.2f} Grows/s  "
                      f"{gemm_gflop/dt/1e3:7.2f} TF/s-equiv  maxerr={err:.2e}")
            except Exception as e:  # noqa: BLE001
                msg = str(e).split(chr(10))[0][:110]
                print(f"  {label:22s} FAILED: {msg}")


if __name__ == "__main__":
    main()
