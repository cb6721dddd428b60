"""Oracle tests for the HBM-streamed windowed conv (r5).

The streamed kernel keeps the feature table in HBM (pl.ANY) and DMAs
per-(offset, tile) windows into a VMEM slot ring — removing the table
budget entirely for production-scale levels.  Pinned against the
resident-table kernel (itself oracle-pinned) and through the conv_k3
route with a shrunk budget + MRCC_CONV_STREAM=1.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mrcc_tpu.ops.conv_pallas import (build_tiled_maps,
                                      gather_gemm_conv_streamed,
                                      gather_gemm_conv_tiled)

pytestmark = pytest.mark.slow


def _mk(rng, k=9, b=2, n=512, cin=96, cout=64):
    idx = np.sort(rng.integers(0, n, size=(k, b, n)), axis=-1).astype(
        np.int32)
    hit = rng.random((k, b, n)) < 0.7
    feats = rng.normal(size=(b, n, cin)).astype(np.float32)
    w = (rng.normal(size=(k, cin, cout)) / 8).astype(np.float32)
    valid = rng.random((b, n)) < 0.95
    tiled = build_tiled_maps(jnp.asarray(idx), jnp.asarray(hit), n)
    return tiled, jnp.asarray(feats), jnp.asarray(w), jnp.asarray(valid), k


def test_streamed_matches_resident(rng):
    tiled, feats, w, valid, k = _mk(rng)
    want = np.asarray(gather_gemm_conv_tiled(feats, w, tiled, valid, k=k))
    got = np.asarray(gather_gemm_conv_streamed(feats, w, tiled, valid, k=k))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_streamed_q8_close(rng):
    tiled, feats, w, valid, k = _mk(rng, cin=64)
    want = np.asarray(gather_gemm_conv_tiled(feats, w, tiled, valid, k=k))
    got = np.asarray(gather_gemm_conv_streamed(feats, w, tiled, valid,
                                               k=k, q8=True))
    rel = (np.linalg.norm(got.astype(np.float32) - want)
           / max(np.linalg.norm(want), 1e-9))
    assert rel < 2e-2, rel


def test_streamed_multigroup_and_chunks(rng):
    """c > 128 lanes (channel-group loop) + forced-narrow windows so the
    chunk DMA path runs."""
    tiled, feats, w, valid, k = _mk(rng, cin=192, cout=48)
    idx_t, starts, nchunks = tiled
    # rebuild maps with a narrow window to force chunk DMAs
    want = np.asarray(gather_gemm_conv_tiled(feats, w, tiled, valid, k=k))
    got = np.asarray(gather_gemm_conv_streamed(feats, w, tiled, valid, k=k))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_streamed_route_via_budget(rng, monkeypatch):
    """MRCC_CONV_STREAM=1 + shrunk budget: gather_gemm_conv_tiled diverts
    to the streamed kernel and still matches the XLA formulation."""
    from mrcc_tpu.ops import conv_pallas
    from mrcc_tpu.sparse import build_hierarchy, voxelize
    from mrcc_tpu.sparse import conv as C
    from mrcc_tpu.sparse.impl import sparse_impl

    monkeypatch.setenv("MRCC_CONV_STREAM", "1")
    pts = jnp.asarray(rng.normal(size=(2, 1024, 3)).astype(np.float32) * .5)
    rgb = jnp.asarray(rng.random((2, 1024, 3)).astype(np.float32))
    mask = jnp.asarray(np.ones((2, 1024), bool))
    with sparse_impl("pallas"):
        vox, _, _ = voxelize(pts, rgb, mask, 1 / 25.0, 768)
        lv = build_hierarchy(vox, 1, capacities=(384,))
    with sparse_impl("xla"):
        vox_x, _, _ = voxelize(pts, rgb, mask, 1 / 25.0, 768)
        lv_x = build_hierarchy(vox_x, 1, capacities=(384,))
    n = lv[0].key.shape[1]
    feats = jnp.asarray(rng.normal(size=(2, n, 96)), jnp.float32)
    feats = jnp.where(lv[0].valid[..., None], feats, 0)
    w = jnp.asarray(rng.normal(size=(27, 96, 64)) / 10, jnp.float32)
    monkeypatch.setattr(conv_pallas, "_TABLE_BUDGET", 64 * 1024)
    with sparse_impl("pallas"):
        got = np.asarray(C.conv_k3(feats, w, lv[0]))
    with sparse_impl("xla"):
        want = np.asarray(C.conv_k3(feats, w, lv_x[0]))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
