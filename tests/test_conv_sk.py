"""Oracle tests for the SELF-KEYED k3 conv (ops/conv_pallas.py sk path).

The self-keyed kernel builds its one-hot from the level's sorted keys
in-kernel (``window_keys == key + delta``) instead of consuming
rank-kernel neighbour tables — no k3 tables are materialised at all
(ROADMAP r5 #1).  These tests pin it three ways:

1. direct kernel vs a dict-lookup numpy oracle, with a forced-narrow
   window so the disjoint-position chunk loop is exercised;
2. full ``build_hierarchy(k3_self_keyed=True)`` + ``conv_k3`` vs the
   table path AND the XLA kernel-map conv on real voxelized data
   (border bitmaps, KEY_PAD padding, identity offset);
3. the routing gate (``sk_supported`` / ``Level.nbr_sk``).

Interpret mode on CPU; scripts/test_on_tpu.py compiles the same path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mrcc_tpu.ops.conv_pallas import (build_sk_maps, gather_gemm_conv_sk,
                                      sk_supported, sk_window)
from mrcc_tpu.sparse import build_hierarchy, voxelize
from mrcc_tpu.sparse import conv as C
from mrcc_tpu.sparse.impl import sparse_impl

# slow tier: interpret-mode Pallas compiles (see test_conv_pallas.py)
pytestmark = pytest.mark.slow


def _np_oracle(keys, kbits, feats, w, deltas):
    """Per-row dict lookup: out[i] = sum_j feats[match(key[i]+d_j)] @ w[j],
    gated by bit j of the row's validity bitmap."""
    b, n, _ = feats.shape
    cout = w.shape[-1]
    want = np.zeros((b, n, cout), np.float32)
    for bi in range(b):
        lut = {int(k): p for p, k in enumerate(keys[bi])}
        for i in range(n):
            for j, d in enumerate(deltas):
                if not (kbits[bi, i] >> j) & 1:
                    continue
                p = lut.get(int(keys[bi, i]) + int(d))
                if p is not None:
                    want[bi, i] += feats[bi, p] @ w[j]
    return want


def _np_tol():
    """Tolerance vs the EXACT numpy oracle: tight in interpret mode; on
    the chip the MXU's default f32 dot precision truncates inputs to
    bf16 (~2^-8 relative), which the XLA-oracle comparisons share but an
    exact numpy oracle does not."""
    import jax

    return 2e-4 if jax.default_backend() == "cpu" else 2e-2


def test_sk_kernel_direct_chunked(rng):
    """Forced 128-wide window at t=256: matches land beyond the first
    window, so the position-partitioned chunk loop must stay exact."""
    b, n, cin, cout = 2, 512, 32, 48
    deltas = (-65, -3, 0, 1, 130)
    keys = np.stack([
        np.sort(rng.choice(np.arange(4 * n), size=n, replace=False))
        for _ in range(b)]).astype(np.int32)
    kbits = rng.integers(0, 1 << len(deltas), size=(b, n)).astype(np.int32)
    feats = rng.normal(size=(b, n, cin)).astype(np.float32)
    w = (rng.normal(size=(len(deltas), cin, cout)) / 6).astype(np.float32)

    sk = build_sk_maps(jnp.asarray(keys), jnp.asarray(kbits), deltas,
                       w_width=128)
    got = np.asarray(gather_gemm_conv_sk(
        jnp.asarray(feats), jnp.asarray(w), jnp.asarray(keys), sk,
        jnp.ones((b, n), bool), deltas, identity_k=2, w_width=128))
    want = _np_oracle(keys, kbits, feats, w, deltas)
    tol = _np_tol()
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def _mk_cloud(rng, b=2, n_pts=1024):
    pts = jnp.asarray(rng.normal(size=(b, n_pts, 3)).astype(np.float32) * .5)
    rgb = jnp.asarray(rng.random((b, n_pts, 3)).astype(np.float32))
    mask = jnp.asarray(np.ones((b, n_pts), bool))
    return pts, rgb, mask


def _mk_levels(cloud, impl, self_keyed, cap=512):
    pts, rgb, mask = cloud
    with sparse_impl(impl):
        vox, _, _ = voxelize(pts, rgb, mask, 1 / 25.0, cap)
        return build_hierarchy(vox, 2, capacities=(384, 256),
                               k3_self_keyed=self_keyed)


@pytest.mark.parametrize("cin,cout", [
    (32, 48),     # single group
    (3, 32),      # conv0-style narrow input (pads to one lane block)
    (192, 64),    # multi-group split (c > 128 lanes)
])
def test_sk_hierarchy_matches_tables_and_xla(rng, cin, cout):
    cloud = _mk_cloud(rng)
    lv_sk = _mk_levels(cloud, "pallas", True)
    lv_tb = _mk_levels(cloud, "pallas", False)
    lv_x = _mk_levels(cloud, "xla", False)
    assert lv_sk[0].nbr_sk is not None and lv_sk[0].nbr_idx is None
    assert lv_tb[0].nbr_sk is None and lv_tb[0].nbr_idx is not None
    for a, t in zip(lv_sk, lv_tb):
        np.testing.assert_array_equal(np.asarray(a.key), np.asarray(t.key))

    b, n = lv_sk[0].key.shape
    feats = jnp.asarray(rng.normal(size=(b, n, cin)), jnp.float32)
    feats = jnp.where(lv_sk[0].valid[..., None], feats, 0)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)) / np.sqrt(cin),
                    jnp.float32)
    bias = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)

    with sparse_impl("xla"):
        want = np.asarray(C.conv_k3(feats, w, lv_x[0], bias=bias))
    with sparse_impl("pallas"):
        got_tb = np.asarray(C.conv_k3(feats, w, lv_tb[0], bias=bias))
        got_sk = np.asarray(C.conv_k3(feats, w, lv_sk[0], bias=bias))
    np.testing.assert_allclose(got_tb, want, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got_sk, want, rtol=2e-4, atol=2e-4)


def test_sk_gate_and_window():
    from mrcc_tpu.ops.conv_pallas import sk_pack, sk_window_packed

    assert sk_pack(512) == 1 and sk_pack(12544) == 1
    assert not sk_supported(500)          # not 128-aligned
    assert sk_pack(12544, itemsize=4) == 2  # f32 over budget -> packed
    # production scale (r5): lane-packed self-keying covers the big levels
    assert sk_pack(73728) == 4            # bf16 pack 4 fits the budget
    assert sk_pack(131072, itemsize=1) == 4  # int8 L0 at max_npoint range
    assert not sk_supported(131072, itemsize=2)  # bf16 131k still tables
    assert sk_window(256, 512) == 384     # t + 128, capped at n's 128-floor
    assert sk_window(256, 256) == 256
    assert sk_window_packed(256, 4, 4096) == 256   # ceil128(64 + 128)
    assert sk_window_packed(256, 2, 4096) == 256


def test_sk_hierarchy_gate_respects_impl(rng):
    """Self-keying only engages under the pallas impls; xla builds keep
    the tables even when the flag is passed (int8 self-keys since r5)."""
    lv = _mk_levels(_mk_cloud(rng), "xla", True)
    assert lv[0].nbr_sk is None and lv[0].nbr_idx is not None
    lv8 = _mk_levels(_mk_cloud(rng), "pallas-int8", True)
    assert lv8[0].nbr_sk is not None and lv8[0].nbr_idx is None


# ------------------------------------------------- r5: packed / int8 / VJP


def test_sk_kernel_packed_direct_chunked(rng):
    """Forced pack=2 with a narrow RAW window (many chunks): the sub-major
    packed compare + OR-merge + row-sum sub recovery must stay exact."""
    b, n, cin, cout = 2, 1024, 32, 48
    deltas = (-130, -65, -3, 0, 1, 130)
    keys = np.stack([
        np.sort(rng.choice(np.arange(4 * n), size=n, replace=False))
        for _ in range(b)]).astype(np.int32)
    kbits = rng.integers(0, 1 << len(deltas), size=(b, n)).astype(np.int32)
    feats = rng.normal(size=(b, n, cin)).astype(np.float32)
    w = (rng.normal(size=(len(deltas), cin, cout)) / 6).astype(np.float32)

    sk = build_sk_maps(jnp.asarray(keys), jnp.asarray(kbits), deltas,
                       w_width=128)
    want = _np_oracle(keys, kbits, feats, w, deltas)
    tol = _np_tol()
    for pack in (2, 4):
        got = np.asarray(gather_gemm_conv_sk(
            jnp.asarray(feats), jnp.asarray(w), jnp.asarray(keys), sk,
            jnp.ones((b, n), bool), deltas, w_width=128, pack=pack))
        np.testing.assert_allclose(got, want, rtol=tol, atol=tol,
                                   err_msg=f"pack={pack}")


@pytest.mark.parametrize("pack", [1, 2])
def test_sk_kernel_q8_direct(rng, pack):
    """int8 self-keyed kernel vs the float oracle (quantization noise
    bounded in relative norm, like the table-path q8 tests)."""
    from mrcc_tpu.ops.conv_pallas import gather_gemm_conv_sk_q8

    b, n, cin, cout = 2, 512, 64, 32
    deltas = (-65, -3, 0, 1, 130)
    keys = np.stack([
        np.sort(rng.choice(np.arange(4 * n), size=n, replace=False))
        for _ in range(b)]).astype(np.int32)
    kbits = rng.integers(0, 1 << len(deltas), size=(b, n)).astype(np.int32)
    feats = rng.normal(size=(b, n, cin)).astype(np.float32)
    w = (rng.normal(size=(len(deltas), cin, cout)) / 6).astype(np.float32)

    sk = build_sk_maps(jnp.asarray(keys), jnp.asarray(kbits), deltas,
                       w_width=128)
    got = np.asarray(gather_gemm_conv_sk_q8(
        jnp.asarray(feats), jnp.asarray(w), jnp.asarray(keys), sk,
        jnp.ones((b, n), bool), deltas, w_width=128, pack=pack)).astype(
            np.float32)
    want = _np_oracle(keys, kbits, feats, w, deltas)
    err = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-9)
    assert err < 2e-2, err


def test_sk_packed_budget_plan(rng, monkeypatch):
    """Shrunk VMEM budget makes the sk PLAN pick the residency pack
    (pack=None -> auto), over a real voxel hierarchy's keys/bitmaps —
    the production-scale shape class.  The HIERARCHY gate deliberately
    rejects packed levels (tables measured faster there), so the pack is
    built explicitly here."""
    from mrcc_tpu.ops import conv_pallas
    from mrcc_tpu.ops.rank_pallas import pack_deltas, sk_bits
    from mrcc_tpu.sparse.hierarchy import K3_OFFSETS

    cloud = _mk_cloud(rng)
    lv_p = _mk_levels(cloud, "pallas", False, cap=512)
    lv0 = lv_p[0]
    n = lv0.key.shape[1]
    monkeypatch.setattr(conv_pallas, "_TABLE_BUDGET", 100 * 1024)
    assert conv_pallas.sk_pack(n, itemsize=4) == 4
    from mrcc_tpu.sparse.hierarchy import _use_self_keyed
    with sparse_impl("pallas"):
        assert not _use_self_keyed(n)      # packed levels keep tables

    deltas = tuple(int(d) for d in pack_deltas(K3_OFFSETS))
    bits = sk_bits(lv0.off, lv0.valid, K3_OFFSETS)
    sk = build_sk_maps(lv0.key, bits, deltas)
    b = lv0.key.shape[0]
    feats = jnp.asarray(rng.normal(size=(b, n, 96)), jnp.float32)
    feats = jnp.where(lv0.valid[..., None], feats, 0)
    w = jnp.asarray(rng.normal(size=(27, 96, 64)) / 10, jnp.float32)
    got = np.asarray(gather_gemm_conv_sk(
        feats, w, lv0.key, sk, lv0.valid, deltas, identity_k=13))
    with sparse_impl("pallas"):
        want = np.asarray(C.conv_k3(feats, w, lv0))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_sk_vjp_matches_xla_grads(rng):
    """The self-keyed custom VJP (negated-delta symmetry backward + dW
    kernel) must match XLA autodiff through the kernel-map conv."""
    import jax

    cloud = _mk_cloud(rng)
    lv_sk = _mk_levels(cloud, "pallas", True)
    lv_x = _mk_levels(cloud, "xla", False)
    np.testing.assert_array_equal(np.asarray(lv_sk[0].key),
                                  np.asarray(lv_x[0].key))
    b, n = lv_sk[0].key.shape
    cin, cout = 32, 48
    feats = jnp.asarray(rng.normal(size=(b, n, cin)), jnp.float32)
    feats = jnp.where(lv_sk[0].valid[..., None], feats, 0)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)) / 6, jnp.float32)
    cot = jnp.asarray(rng.normal(size=(b, n, cout)), jnp.float32)

    def loss_sk(f, ww):
        with sparse_impl("pallas"):
            return (C.conv_k3(f, ww, lv_sk[0]) * cot).sum()

    def loss_x(f, ww):
        with sparse_impl("xla"):
            return (C.conv_k3(f, ww, lv_x[0]) * cot).sum()

    df_sk, dw_sk = jax.grad(loss_sk, argnums=(0, 1))(feats, w)
    df_x, dw_x = jax.grad(loss_x, argnums=(0, 1))(feats, w)
    tol = 2e-3 if jax.default_backend() == "cpu" else 2e-2
    np.testing.assert_allclose(np.asarray(df_sk), np.asarray(df_x),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(dw_sk), np.asarray(dw_x),
                               rtol=tol, atol=tol)
