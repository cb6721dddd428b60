"""Oracle tests: Pallas windowed gather-GEMM conv vs the XLA kernel-map conv.

Run in interpreter mode on CPU (ops/conv_pallas.py auto-interprets off-TPU);
the same code path compiles via Mosaic on the chip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrcc_tpu.ops.conv_pallas import gather_gemm_conv, supported
from mrcc_tpu.sparse.conv import conv_kernel_map

# slow tier: interpret-mode Pallas conv oracles (minutes of XLA-CPU compile each) — run with --full or scripts/test_on_tpu.py
pytestmark = pytest.mark.slow


def monotone_maps(rng, k, b, n, hit_rate=0.7, drift=8):
    """Synthetic monotone kernel maps like searchsorted output."""
    idx = np.zeros((k, b, n), np.int32)
    base = np.arange(n)
    for ki in range(k):
        shift = rng.integers(-n // 4, n // 4)
        for bi in range(b):
            v = np.clip(base + shift + rng.integers(-drift, drift, size=n),
                        0, n - 1)
            idx[ki, bi] = np.sort(v)
    hit = rng.random((k, b, n)) < hit_rate
    return jnp.asarray(idx), jnp.asarray(hit)


@pytest.mark.parametrize("k,n,cin,cout", [
    (27, 256, 32, 32),
    (27, 256, 96, 64),
    (8, 128, 64, 128),
    (27, 512, 256, 256),   # multi-group (KG < K)
])
def test_oracle_matches_xla(rng, k, n, cin, cout):
    b = 2
    feats = jnp.asarray(rng.normal(size=(b, n, cin)), jnp.float32)
    idx, hit = monotone_maps(rng, k, b, n)
    w = jnp.asarray(rng.normal(size=(k, cin, cout)) / np.sqrt(cin),
                    jnp.float32)
    valid = jnp.asarray(rng.random((b, n)) < 0.9)
    bias = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)

    want = np.asarray(conv_kernel_map(feats, w, idx, hit, valid, bias=bias))
    got = np.asarray(gather_gemm_conv(feats, w, idx, hit, valid, bias=bias))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_exact_with_huge_spans(rng):
    """Tiles whose index span vastly exceeds the window width must still be
    exact (the dynamic chunk loop)."""
    k, b, n, cin, cout = 4, 1, 256, 32, 32
    # adversarial: indices jump across the whole table inside one tile
    idx = np.sort(rng.integers(0, n, size=(k, b, n)), axis=-1).astype(np.int32)
    hit = rng.random((k, b, n)) < 0.8
    feats = jnp.asarray(rng.normal(size=(b, n, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, cin, cout)) / 6, jnp.float32)
    valid = jnp.ones((b, n), bool)

    want = np.asarray(conv_kernel_map(feats, w, jnp.asarray(idx),
                                      jnp.asarray(hit), valid))
    got = np.asarray(gather_gemm_conv(feats, w, jnp.asarray(idx),
                                      jnp.asarray(hit), valid,
                                      w_width=64))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_all_missing_offset(rng):
    """Offsets with zero hits contribute nothing."""
    k, b, n, cin, cout = 3, 1, 128, 32, 32
    idx, hit = monotone_maps(rng, k, b, n)
    hit = hit.at[1].set(False)
    feats = jnp.asarray(rng.normal(size=(b, n, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, cin, cout)), jnp.float32)
    valid = jnp.ones((b, n), bool)
    want = np.asarray(conv_kernel_map(feats, w, idx, hit, valid))
    got = np.asarray(gather_gemm_conv(feats, w, idx, hit, valid))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_bfloat16_path(rng):
    k, b, n, cin, cout = 27, 256, 64, 64, 64
    n = 256
    idx, hit = monotone_maps(rng, k, b, n)
    feats = jnp.asarray(rng.normal(size=(b, n, cin)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(k, cin, cout)) / 8, jnp.float32)
    valid = jnp.ones((b, n), bool)
    want = np.asarray(conv_kernel_map(feats, w, idx, hit, valid),
                      np.float32)
    got = np.asarray(gather_gemm_conv(feats, w, idx, hit, valid), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_supported_predicate(rng):
    feats = jnp.zeros((1, 128, 32))
    assert supported(jnp.zeros((27, 1, 128), jnp.int32), feats)
    assert supported(jnp.zeros((27, 1, 120), jnp.int32), feats)  # t=8
    assert not supported(jnp.zeros((27, 1, 7), jnp.int32), feats)


def test_engine_seg_stage_parity_pallas_vs_xla():
    """The engine's segmentation stage produces identical labels through
    both conv implementations (pallas runs interpreted on CPU)."""
    import jax

    from mrcc_tpu.app import InferenceConfig, InferenceEngine
    from mrcc_tpu.data.synthetic import generate_sample

    kw = dict(point_capacity=2048, seg_voxel_capacity=512,
              ee_point_capacity=256, ee_voxel_capacity=256,
              kp_voxel_capacity=256, seg_backbone="minkunet14A",
              rot_backbone="minkunet14A", kp_backbone="minkunet14A",
              icp_iterations=2, icp_template_points=128,
              compute_dtype="float32")
    eng_x = InferenceEngine(InferenceConfig(conv_impl="xla", **kw), seed=0)
    eng_p = InferenceEngine(InferenceConfig(conv_impl="pallas", **kw), seed=0,
                            params=eng_x.params)

    s = generate_sample(seed=5, n_ee=400, n_arm=600, n_bg=800)
    pts = np.zeros((1, 2048, 3), np.float32)
    rgb = np.zeros((1, 2048, 3), np.float32)
    mask = np.zeros((1, 2048), bool)
    npt = min(len(s["points"]), 2048)
    pts[0, :npt] = s["points"][:npt]
    rgb[0, :npt] = s["rgb"][:npt]
    mask[0, :npt] = True

    seg_x = np.asarray(jax.device_get(eng_x._seg_jit(
        eng_x.params["segmentation"], pts, rgb, mask)[0]))
    seg_p = np.asarray(jax.device_get(eng_p._seg_jit(
        eng_p.params["segmentation"], pts, rgb, mask)[0]))
    assert (seg_x == seg_p).mean() > 0.999  # f32 vs tiny numeric jitter at argmax


class TestLanePacked:
    """Lane-packed tables (production-scale levels whose 128-lane tables
    exceed the VMEM budget).  Packing is forced by shrinking the table
    budget so the small interpret-mode shapes exercise the exact code the
    72k-voxel production levels compile (VERDICT r2 #3)."""

    @staticmethod
    def _force_pack(monkeypatch, budget):
        from mrcc_tpu.ops import conv_pallas

        monkeypatch.setattr(conv_pallas, "_TABLE_BUDGET", budget)
        # keep these tests on the lane-packed RESIDENT path: the streamed
        # route (default since r5) would otherwise absorb the over-budget
        # shapes and the pack plan would lose its only full-route coverage
        monkeypatch.setenv("MRCC_CONV_STREAM", "0")

    def test_plan_production_shapes(self):
        """72k-voxel L0 at bf16 c=128: pack=4, c_g=32 (18 MB -> 4.6 MB)."""
        from mrcc_tpu.ops.conv_pallas import _split_plan, supported_dims

        c_g, n_cg, c_pad, kg, n_kg, pack = _split_plan(
            73728, 128, 27, 32, itemsize=2)
        assert pack == 4 and c_g == 32 and n_cg == 4 and n_kg == 1
        assert supported_dims(73728, 73728, itemsize=2)
        # int8 needs only pack=2 at this scale
        *_, pack8 = _split_plan(73728, 128, 27, 32, itemsize=1)
        assert pack8 == 2
        # conv0-style narrow input: one group, channels padded to c_g
        c_g, n_cg, c_pad, kg, n_kg, pack = _split_plan(
            73728, 3, 27, 32, itemsize=2)
        assert pack == 4 and c_g == 32 and n_cg == 1 and c_pad == 32

    @pytest.mark.parametrize("cin,cout", [(3, 32), (64, 64), (128, 96)])
    def test_packed_oracle(self, rng, monkeypatch, cin, cout):
        self._force_pack(monkeypatch, 144 * 1024)
        from mrcc_tpu.ops.conv_pallas import _split_plan

        k, b, n = 27, 2, 1024
        *_, pack = _split_plan(n, cin, k, 32, itemsize=4)
        assert pack == 4
        feats = jnp.asarray(rng.normal(size=(b, n, cin)), jnp.float32)
        idx, hit = monotone_maps(rng, k, b, n)
        w = jnp.asarray(rng.normal(size=(k, cin, cout)) / np.sqrt(cin),
                        jnp.float32)
        valid = jnp.asarray(rng.random((b, n)) < 0.9)
        want = np.asarray(conv_kernel_map(feats, w, idx, hit, valid))
        got = np.asarray(gather_gemm_conv(feats, w, idx, hit, valid))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_packed_huge_spans(self, rng, monkeypatch):
        """Packed chunk loop stays exact for spans far beyond the window."""
        self._force_pack(monkeypatch, 144 * 1024)
        k, b, n, cin, cout = 4, 1, 1024, 32, 32
        idx = np.sort(rng.integers(0, n, size=(k, b, n)),
                      axis=-1).astype(np.int32)
        hit = rng.random((k, b, n)) < 0.8
        feats = jnp.asarray(rng.normal(size=(b, n, cin)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, cin, cout)) / 6, jnp.float32)
        valid = jnp.ones((b, n), bool)
        want = np.asarray(conv_kernel_map(feats, w, jnp.asarray(idx),
                                          jnp.asarray(hit), valid))
        got = np.asarray(gather_gemm_conv(feats, w, jnp.asarray(idx),
                                          jnp.asarray(hit), valid))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_packed_q8_oracle(self, rng, monkeypatch):
        self._force_pack(monkeypatch, 100 * 1024)
        from mrcc_tpu.ops.conv_pallas import (_split_plan, build_tiled_maps,
                                              gather_gemm_conv_tiled_q8)

        k, b, n, cin, cout = 27, 1, 1024, 64, 64
        *_, pack = _split_plan(n, cin, k, 32, itemsize=1)
        assert pack >= 2
        idx, hit = monotone_maps(rng, k, b, n)
        feats = jnp.asarray(rng.normal(size=(b, n, cin)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, cin, cout)) / 20, jnp.float32)
        valid = jnp.ones((b, n), bool)
        tiled = build_tiled_maps(idx, hit, n)
        got = np.asarray(gather_gemm_conv_tiled_q8(feats, w, tiled, valid,
                                                   k=k))
        want = np.asarray(conv_kernel_map(feats, w, idx, hit, valid))
        err = (np.abs(got - want).max()
               / max(np.abs(want).max(), 1e-6))
        assert err < 2e-2

    def test_packed_grads(self, rng, monkeypatch):
        """Packed dW / dfeats match the XLA conv's gradients."""
        self._force_pack(monkeypatch, 144 * 1024)
        from mrcc_tpu.ops.conv_pallas import (build_tiled_maps,
                                              dw_gather_gemm,
                                              gather_gemm_conv_tiled)

        k, b, n, cin, cout = 27, 1, 1024, 32, 32
        idx, hit = monotone_maps(rng, k, b, n)
        feats = jnp.asarray(rng.normal(size=(b, n, cin)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, cin, cout)) / np.sqrt(cin),
                        jnp.float32)
        valid = jnp.ones((b, n), bool)
        tiled = build_tiled_maps(idx, hit, n)

        # forward parity first
        got = np.asarray(gather_gemm_conv_tiled(feats, w, tiled, valid, k=k))
        want = np.asarray(conv_kernel_map(feats, w, idx, hit, valid))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

        # dW via the packed kernel vs autodiff of the XLA conv
        g = jnp.asarray(rng.normal(size=(b, n, cout)), jnp.float32)

        def loss_xla(w):
            return (conv_kernel_map(feats, w, idx, hit, valid) * g).sum()

        dw_want = np.asarray(jax.grad(loss_xla)(w))
        dw_got = np.asarray(dw_gather_gemm(feats, g, tiled, k, cin=cin))
        np.testing.assert_allclose(dw_got, dw_want, rtol=2e-3, atol=2e-3)


def test_packed_bcast_wide_oracle(rng, monkeypatch):
    """Lane-packed BROADCAST (octant/up) maps through the wide-GEMM
    formulation: one packed gather + [T, pack*c_g] x [.., kg*Cout] GEMM +
    octant select must match the generic kernel-map oracle."""
    from mrcc_tpu.ops import conv_pallas as cp
    from mrcc_tpu.ops.conv_pallas import (_split_plan, build_tiled_maps,
                                          gather_gemm_conv_tiled)
    from mrcc_tpu.sparse.conv import conv_kernel_map

    monkeypatch.setattr(cp, "_TABLE_BUDGET", 300 * 1024)
    k, b, n_in, n_out, cin, cout = 8, 2, 1024, 1024, 64, 48
    *_, pack = _split_plan(n_in, cin, k, 8, itemsize=4)
    assert pack > 1, "budget must force the packed path"

    parent = np.sort(rng.integers(0, n_in, size=(b, n_out)).astype(np.int32),
                     axis=1)
    octant = rng.integers(0, k, size=(b, n_out))
    idx8 = np.broadcast_to(parent[None], (k, b, n_out)).copy()
    hit8 = octant[None] == np.arange(k)[:, None, None]
    feats = jnp.asarray(rng.normal(size=(b, n_in, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, cin, cout)) / 6, jnp.float32)
    valid = jnp.ones((b, n_out), bool)

    span = jnp.ones((k, b, n_out), bool)
    tiled = build_tiled_maps(jnp.asarray(idx8), jnp.asarray(hit8), n_in,
                             span_hit=span)
    got = np.asarray(gather_gemm_conv_tiled(feats, w, tiled, valid, k=k,
                                            bcast_k=True))
    want = np.asarray(conv_kernel_map(feats, w, jnp.asarray(idx8),
                                      jnp.asarray(hit8), valid))
    err = (np.linalg.norm(got - want)
           / max(np.linalg.norm(want), 1e-9))
    assert err < 3e-3, err
