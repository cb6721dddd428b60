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
