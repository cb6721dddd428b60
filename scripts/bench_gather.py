"""Microbenchmark: sparse-conv gather strategies on TPU.

The round-1 wall: XLA row-gathers run ~10 ns/row (~100x off HBM roofline),
bounding every sparse conv (27 gathers each).  This probe measures, at
representative U-Net level shapes, the candidate replacements:

  S1  take_along_axis (current conv path)          [XLA gather]
  S2  full one-hot matmul                          [MXU, N_in-wide]
  S3  windowed one-hot matmul, per-tile dynamic_slice windows (exploits
      monotonic nbr_idx)                           [XLA scan + MXU]
  S4  pallas: whole table in VMEM, windowed one-hot matmul per offset
  S5  pallas: per-row dynamic loads from VMEM table (fori_loop)
  S6  the conv GEMM alone (floor)

Run:  python scripts/bench_gather.py [LEVEL ...]
Honest timing: every measurement forces completion via jax.device_get.
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


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------- S1
@partial(jax.jit, static_argnames=())
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
@jax.jit
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


# ---------------------------------------------------------------- S3
@partial(jax.jit, static_argnames=("t", "win"))
def s3_windowed(feats, idx, hit, w, t=128, win=512):
    n = feats.shape[1]
    n_t = n // t
    wt = w.astype(feats.dtype)

    # per (k, tile) window start, clamped so the window fits
    starts = jnp.minimum(idx[:, :, ::t], n - win)  # [K, B, n_t]

    def tile_step(carry, tidx):
        def k_step(acc, inp):
            wk, i_k, h_k, st_k = inp  # [B,t], [B,t], [B]
            # per-item dynamic window: vmap dynamic_slice over batch
            window = jax.vmap(
                lambda f, s: jax.lax.dynamic_slice(f, (s, 0), (win,
                                                               f.shape[1]))
            )(feats, st_k)  # [B, win, C]
            local = i_k - st_k[:, None]
            oh = (local[..., None] == jnp.arange(win)[None, None, :])
            oh = jnp.where(h_k[..., None] & (local[..., None] >= 0)
                           & (local[..., None] < win), oh, False)
            g = jnp.einsum("bmw,bwc->bmc", oh.astype(feats.dtype), window,
                           preferred_element_type=jnp.float32
                           ).astype(feats.dtype)
            return acc + jnp.einsum("bmc,cd->bmd", g, wk,
                                    preferred_element_type=jnp.float32), None

        i_t = jax.lax.dynamic_slice_in_dim(idx, tidx * t, t, axis=2)
        h_t = jax.lax.dynamic_slice_in_dim(hit, tidx * t, t, axis=2)
        st = jax.lax.dynamic_slice_in_dim(starts, tidx, 1, axis=2)[..., 0]
        init = jnp.zeros((B, t, w.shape[-1]), jnp.float32)
        out_t, _ = jax.lax.scan(k_step, init, (wt, i_t, h_t, st))
        return carry, out_t

    _, tiles = jax.lax.scan(tile_step, None, jnp.arange(n_t))
    return jnp.moveaxis(tiles, 0, 1).reshape(B, n, w.shape[-1])


# ---------------------------------------------------------------- S4
def s4_pallas_windowed(feats, idx, hit, w, t=128, win=512):
    n, cin = feats.shape[1], feats.shape[2]
    cout = w.shape[-1]
    n_t = n // t
    starts = jnp.minimum(idx[:, :, ::t], n - win).astype(jnp.int32)  # [K,B,nt]

    def kernel(starts_ref, feats_ref, idx_ref, hit_ref, w_ref, out_ref):
        b = pl.program_id(0)
        ti = pl.program_id(1)
        acc = jnp.zeros((t, cout), jnp.float32)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (t, win), 1)
        for k in range(K):
            st = starts_ref[k, b, ti]
            window = feats_ref[b, pl.ds(st, win), :]  # VMEM slice
            local = idx_ref[k, b, pl.ds(ti * t, t)] - st
            h = hit_ref[k, b, pl.ds(ti * t, t)]
            oh = (local[:, None] == iota_w) & (h[:, None] != 0)
            g = jnp.dot(oh.astype(window.dtype), window,
                        preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(g.astype(w_ref.dtype), w_ref[k],
                                preferred_element_type=jnp.float32)
        out_ref[b, pl.ds(ti * t, t), :] = acc

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, n, cout), jnp.float32),
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return jax.jit(lambda f, i, h, ww: fn(starts, f, i, h.astype(jnp.int32),
                                          ww.astype(f.dtype)))(
        feats, idx, hit, w)


# ---------------------------------------------------------------- S5
def s5_pallas_rowloop(feats, idx, hit, w):
    n, cin = feats.shape[1], feats.shape[2]
    cout = w.shape[-1]
    t = 128
    n_t = n // t

    def kernel(feats_ref, idx_ref, hit_ref, w_ref, out_ref, scratch):
        b = pl.program_id(0)
        ti = pl.program_id(1)
        acc = jnp.zeros((t, cout), jnp.float32)
        for k in range(K):
            def body(r, _):
                j = idx_ref[k, b, ti * t + r]
                scratch[r, :] = feats_ref[b, j, :]
                return _

            jax.lax.fori_loop(0, t, body, None)
            h = hit_ref[k, b, pl.ds(ti * t, t)]
            g = jnp.where(h[:, None] != 0, scratch[:, :], 0)
            acc = acc + jnp.dot(g.astype(w_ref.dtype), w_ref[k],
                                preferred_element_type=jnp.float32)
        out_ref[b, pl.ds(ti * t, t), :] = acc

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, n, cout), jnp.float32),
        grid=(B, n_t),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((t, cin), jnp.float32)],
    )
    return jax.jit(lambda f, i, h, ww: fn(f, i, h.astype(jnp.int32),
                                          ww.astype(f.dtype)))(
        feats, idx, hit, w)


# ---------------------------------------------------------------- S6
@jax.jit
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
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '')}")
    for name in names:
        n, cin, cout = LEVELS[name]
        feats, idx, hit = make_inputs(n, cin)
        w = jnp.asarray(
            np.random.default_rng(1).normal(size=(K, cin, cout)) / cin,
            jnp.float32)
        rows = K * B * n
        results = {}
        feats_bf = jnp.asarray(feats, jnp.bfloat16)
        ref = None
        for label, fn, f in [
            ("S1_take_f32", s1_take, jnp.asarray(feats)),
            ("S1_take_bf16", s1_take, feats_bf),
            ("S2_onehot_bf16", s2_onehot, feats_bf),
            ("S3_windowed_bf16", s3_windowed, feats_bf),
            ("S4_pallas_win_bf16", s4_pallas_windowed, feats_bf),
            ("S5_pallas_row_bf16", s5_pallas_rowloop, feats_bf),
            ("S6_gemm_floor_bf16", s6_gemm_floor, feats_bf),
        ]:
            try:
                dt = timeit(fn, f, idx, hit, w)
                out = np.asarray(fn(f, idx, hit, w), np.float32)
                if label == "S1_take_f32":
                    ref = out
                err = (np.abs(out - ref).max() if ref is not None else -1)
                results[label] = (dt, err)
            except Exception as e:  # noqa: BLE001
                results[label] = (None, str(e).split(chr(10))[0][:90])
        print(f"\n== {name}: N={n} Cin={cin} Cout={cout} B={B} K={K} "
              f"({rows/1e6:.2f}M rows/conv)")
        for label, (dt, err) in results.items():
            if dt is None:
                print(f"  {label:22s} FAILED: {err}")
            else:
                print(f"  {label:22s} {dt*1e3:8.3f} ms   "
                      f"{rows/dt/1e9:7.2f} Grows/s   maxerr={err:.2e}")


if __name__ == "__main__":
    main()
