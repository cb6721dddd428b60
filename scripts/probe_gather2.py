"""Probe 2: dynamic-gather lowering forms + realistic resident-table conv.

probe_gather_modes.py showed `jnp.take`/`take_along_axis` reach a Mosaic
lowering that wants *matching shapes*.  Here we test the equal-shape form
(indices broadcast/materialized to the operand's shape) plus int8 dots,
and then a realistic mini-conv with the feature table resident (like the
real kernel), comparing one-hot gather vs dynamic gather per offset.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(f, *args, iters=20):
    out = jax.block_until_ready(f(*args))
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def check(name, fn):
    try:
        res = fn()
        print(f"{name:22s} OK   {res}")
    except Exception as e:  # noqa: BLE001
        msg = (str(e).splitlines() or [repr(e)])[0][:150]
        print(f"{name:22s} FAILED: {msg}")


# ---------------------------------------------------------- lowering forms
W, C, T = 256, 128, 128


def taa_equal_shape():
    """take_along_axis with indices materialized to operand shape."""
    win = jax.random.normal(jax.random.PRNGKey(0), (W, C), jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (8, T), 0, W, jnp.int32)

    def kernel(idx_ref, win_ref, out_ref):
        w = win_ref[:]
        ix = idx_ref[0]                                   # [T]
        ixm = ix[:, None] + jnp.zeros((T, C), jnp.int32)  # materialize [T,C]
        # pad indices to operand length W with a wrap (rows >= T unused)
        ix_full = jnp.concatenate(
            [ixm, jnp.zeros((W - T, C), jnp.int32)], axis=0)
        g = jnp.take_along_axis(w, ix_full, axis=0)
        out_ref[:] = g[:T]

    @jax.jit
    def f(idx, win):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, C), jnp.bfloat16),
        )(idx, win)

    out = f(idx, win)
    ref = np.asarray(win)[np.asarray(idx)[0]]
    ok = np.allclose(np.asarray(out, np.float32), ref.astype(np.float32))
    return f"correct={ok}"


def taa_same_len():
    """take_along_axis where indices length == operand length (W==T case)."""
    win = jax.random.normal(jax.random.PRNGKey(0), (W, C), jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (8, W), 0, W, jnp.int32)

    def kernel(idx_ref, win_ref, out_ref):
        w = win_ref[:]
        ixm = idx_ref[0][:, None] + jnp.zeros((W, C), jnp.int32)
        out_ref[:] = jnp.take_along_axis(w, ixm, axis=0)

    @jax.jit
    def f(idx, win):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((W, C), jnp.bfloat16),
        )(idx, win)

    out = f(idx, win)
    ref = np.asarray(win)[np.asarray(idx)[0]]
    ok = np.allclose(np.asarray(out, np.float32), ref.astype(np.float32))
    return f"correct={ok}"


def int8_dot():
    a = jnp.ones((128, 256), jnp.int8)
    b = jnp.ones((256, 128), jnp.int8)

    def kernel(a_ref, b_ref, out_ref):
        out_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                             preferred_element_type=jnp.int32)

    @jax.jit
    def f(a, b):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
        )(a, b)

    out = f(a, b)
    return f"sum_ok={int(np.asarray(out)[0,0]) == 256}"


# ------------------------------------------------- realistic mini-conv
def mini_conv(mode, n=12416, cin=512, cout=384, t=128, w=256, kg=8, k=27,
              b=2, cg=128):
    """Resident-table conv shaped like the real block8 conv1.

    mode 'onehot': per-offset [T,W]@[W,cg] one-hot dots into scratch, then
    big GEMM  (round-2 formulation, channel-grouped).
    mode 'dyn': per-offset equal-shape take_along_axis gather from the
    window (VPU), then the same big GEMM (full channel width at once).
    """
    nt = n // t
    n_kg = -(-k // kg)
    kp = n_kg * kg
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((b, n, cin)), jnp.bfloat16)
    wts = jnp.asarray(rng.standard_normal((kp * cin, cout)), jnp.bfloat16)
    # monotone per-offset indices
    base = np.arange(n)
    idx = np.zeros((b, nt, kp, t), np.int32)
    starts = np.zeros((kp, b, nt), np.int32)
    for ki in range(kp):
        shift = rng.integers(-n // 8, n // 8)
        row = np.clip(base + shift + rng.integers(-8, 8, size=n), 0, n - 1)
        row.sort()
        for bi in range(b):
            r = row.reshape(nt, t)
            idx[bi, :, ki, :] = r
            st = np.clip(r[:, 0] - (r[:, 0] % 128), 0, n - w)
            starts[ki, bi] = st
    hit = (rng.random((b, nt, kp, t)) < 0.7).astype(np.int32)
    idx_t, hit_t = jnp.asarray(idx), jnp.asarray(hit)
    starts_f = jnp.asarray(starts.reshape(-1))

    # channel-group when the table exceeds the VMEM budget (both modes)
    n_cg = -(-cin // cg) if n * cin * 2 > 5 * 1024 * 1024 else 1

    def kernel(starts_ref, idx_ref, hit_ref, feats_ref, w_ref, out_ref,
               gall_ref, acc_ref):
        bi, ti, kgi = (pl.program_id(0), pl.program_id(1), pl.program_id(2))
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (t, w), 1)
        cin_l = feats_ref.shape[-1]
        for j in range(kg):
            kk = kgi * kg + j
            flat = (kk * pl.num_programs(0) + bi) * nt + ti
            st = starts_ref[flat]
            local = idx_ref[0, 0, kk, :] - st
            hitv = hit_ref[0, 0, kk, :]
            window = feats_ref[0, pl.ds(pl.multiple_of(st, 128), w), :]
            if mode == "onehot":
                oh = (local[:, None] == iota_w) & (hitv[:, None] != 0)
                g = jnp.dot(oh.astype(window.dtype), window,
                            preferred_element_type=jnp.float32)
                gall_ref[:, j * cin_l:(j + 1) * cin_l] = g.astype(
                    gall_ref.dtype)
            else:
                ixm = (jnp.clip(local, 0, w - 1)[:, None]
                       + jnp.zeros((t, cin_l), jnp.int32))
                ix_full = jnp.concatenate(
                    [ixm, jnp.zeros((w - t, cin_l), jnp.int32)], axis=0)
                g = jnp.take_along_axis(window, ix_full, axis=0)[:t]
                g = jnp.where(hitv[:, None] != 0, g, 0)
                gall_ref[:, j * cin_l:(j + 1) * cin_l] = g
        contrib = jnp.dot(gall_ref[:, :], w_ref[0],
                          preferred_element_type=jnp.float32)
        @pl.when(kgi == 0)
        def _():
            acc_ref[:] = contrib
        @pl.when(kgi != 0)
        def _():
            acc_ref[:] = acc_ref[:] + contrib
        @pl.when(kgi == pl.num_programs(2) - 1)
        def _():
            out_ref[0] = acc_ref[:].astype(out_ref.dtype)

    def call_group(f_sl, w_sl, cin_l):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nt, n_kg),
            in_specs=[
                pl.BlockSpec((1, 1, kp, t), lambda bi, ti, kgi, s: (bi, ti, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, kp, t), lambda bi, ti, kgi, s: (bi, ti, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, cin_l), lambda bi, ti, kgi, s: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kg * cin_l, cout), lambda bi, ti, kgi, s: (kgi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, t, cout), lambda bi, ti, kgi, s: (bi, ti, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((t, kg * cin_l), jnp.bfloat16),
                            pltpu.VMEM((t, cout), jnp.float32)],
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, n, cout), jnp.bfloat16),
            grid_spec=grid_spec,
        )(starts_f, idx_t, hit_t, f_sl, w_sl)

    @jax.jit
    def f(feats, wts):
        if n_cg == 1:
            w3 = wts.reshape(kp, cin, cout).reshape(n_kg, kg * cin, cout)
            return call_group(feats, w3, cin)
        out = None
        wr = wts.reshape(kp, cin, cout)
        for g in range(n_cg):
            f_sl = feats[:, :, g * cg:(g + 1) * cg]
            w_sl = wr[:, g * cg:(g + 1) * cg, :].reshape(n_kg, kg * cg, cout)
            o = call_group(f_sl, w_sl, cg)
            out = o if out is None else out + o
        return out

    dt = run(f, feats, wts)
    flops = 2 * b * n * kp * cin * cout  # the dense-k GEMM work
    return f"{dt*1e3:8.3f} ms  {flops/dt/1e12:7.1f} TF/s(gemm-only)"


def main():
    check("taa-equal-shape", taa_equal_shape)
    check("taa-same-len", taa_same_len)
    check("int8-dot", int8_dot)
    for mode in ("onehot", "dyn"):
        for cfg in (dict(), dict(n=2816, cin=256, cout=256, b=8),
                    dict(n=12416, cin=128, cout=128, b=8, kg=16)):
            check(f"mini-conv-{mode} {cfg or 'big'}",
                  lambda m=mode, c=cfg: mini_conv(m, **c))


if __name__ == "__main__":
    main()
