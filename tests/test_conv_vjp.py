"""Grad oracle tests: Pallas conv custom VJP vs autodiff through the XLA
kernel-map path, on REAL coordinate hierarchies (the VJP exploits the
symmetry of submanifold adjacency, which synthetic random maps lack).

Interpret mode on CPU; the same code path compiles via Mosaic on TPU
(scripts/test_on_tpu.py runs this file on the chip).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrcc_tpu.sparse import build_hierarchy, voxelize
from mrcc_tpu.sparse import conv as C
from mrcc_tpu.sparse.impl import sparse_impl

# slow tier: interpret-mode custom-VJP grad oracles — run with --full or scripts/test_on_tpu.py
pytestmark = pytest.mark.slow

B, N, CAP = 2, 384, 256
HCAPS = (128, 128, 128, 128)


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(7)
    pts = rng.normal(size=(B, N, 3)).astype(np.float32) * 0.5
    rgb = rng.random((B, N, 3)).astype(np.float32)
    mask = np.ones((B, N), bool)
    mask[:, N - 40:] = False
    return jnp.asarray(pts), jnp.asarray(rgb), jnp.asarray(mask)


def _levels(cloud, impl):
    pts, rgb, mask = cloud
    with sparse_impl(impl):
        vox, _, _ = voxelize(pts, rgb, mask, 1 / 20.0, CAP)
        return vox, build_hierarchy(vox, 2, capacities=HCAPS[:2])


def _grads(loss_fn, feats, weights):
    return jax.grad(lambda f, w: loss_fn(f, w), argnums=(0, 1))(
        feats, weights)


def test_k3_grads_match_xla(cloud):
    rng = np.random.default_rng(0)
    vox_x, lv_x = _levels(cloud, "xla")
    vox_p, lv_p = _levels(cloud, "pallas")
    assert lv_p[0].nbr_tiled is not None
    n = lv_x[0].key.shape[1]
    cin, cout = 32, 48
    feats = jnp.asarray(rng.normal(size=(B, n, cin)), jnp.float32)
    feats = jnp.where(lv_x[0].valid[..., None], feats, 0)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)) / 6, jnp.float32)
    r = jnp.asarray(rng.normal(size=(B, n, cout)), jnp.float32)

    def loss(level):
        def f(feats, w):
            return (C.conv_k3(feats, w, level) * r).sum()
        return f

    def run(level, impl):
        with sparse_impl(impl):
            return _grads(loss(level), feats, w)

    df_x, dw_x = run(lv_x[0], "xla")
    df_p, dw_p = run(lv_p[0], "pallas")
    np.testing.assert_allclose(np.asarray(df_p), np.asarray(df_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw_p), np.asarray(dw_x),
                               rtol=1e-4, atol=1e-4)


def test_down_grads_match_xla(cloud):
    rng = np.random.default_rng(1)
    _, lv_x = _levels(cloud, "xla")
    _, lv_p = _levels(cloud, "pallas")
    assert lv_p[0].up_tiled is not None
    n = lv_x[0].key.shape[1]
    nc = lv_x[1].key.shape[1]
    cin, cout = 24, 40
    feats = jnp.asarray(rng.normal(size=(B, n, cin)), jnp.float32)
    feats = jnp.where(lv_x[0].valid[..., None], feats, 0)
    w = jnp.asarray(rng.normal(size=(8, cin, cout)) / 5, jnp.float32)
    r = jnp.asarray(rng.normal(size=(B, nc, cout)), jnp.float32)

    def run(fine, coarse, impl):
        def f(feats, w):
            with sparse_impl(impl):
                return (C.conv_down(feats, w, fine, coarse) * r).sum()
        return _grads(f, feats, w)

    df_x, dw_x = run(lv_x[0], lv_x[1], "xla")
    df_p, dw_p = run(lv_p[0], lv_p[1], "pallas")
    np.testing.assert_allclose(np.asarray(df_p), np.asarray(df_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw_p), np.asarray(dw_x),
                               rtol=1e-4, atol=1e-4)


def test_transpose_up_grads_match_xla(cloud):
    rng = np.random.default_rng(2)
    _, lv_x = _levels(cloud, "xla")
    _, lv_p = _levels(cloud, "pallas")
    n = lv_x[0].key.shape[1]
    nc = lv_x[1].key.shape[1]
    cin, cout = 40, 24
    feats = jnp.asarray(rng.normal(size=(B, nc, cin)), jnp.float32)
    feats = jnp.where(lv_x[1].valid[..., None], feats, 0)
    w = jnp.asarray(rng.normal(size=(8, cin, cout)) / 5, jnp.float32)
    r = jnp.asarray(rng.normal(size=(B, n, cout)), jnp.float32)

    def run(fine, coarse, impl):
        def f(feats, w):
            with sparse_impl(impl):
                return (C.conv_transpose_up(feats, w, coarse, fine)
                        * r).sum()
        return _grads(f, feats, w)

    df_x, dw_x = run(lv_x[0], lv_x[1], "xla")
    df_p, dw_p = run(lv_p[0], lv_p[1], "pallas")
    np.testing.assert_allclose(np.asarray(df_p), np.asarray(df_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw_p), np.asarray(dw_x),
                               rtol=1e-4, atol=1e-4)


def test_unet_train_step_pallas(cloud):
    """A whole U-Net train-step gradient traces on the Pallas path and
    matches the XLA path (the ROADMAP #1 'train on the kernel path' bar)."""
    from mrcc_tpu.models import make_minkunet

    pts, rgb, mask = cloud
    model = make_minkunet("minkunet14A", 3, 3)

    def step(impl):
        with sparse_impl(impl):
            vox, _, _ = voxelize(pts, rgb, mask, 1 / 20.0, CAP)
            levels = build_hierarchy(vox, 4, capacities=HCAPS)
            variables = model.init(jax.random.PRNGKey(0), vox.feats, levels)

            def loss(params):
                out = model.apply({**variables, "params": params},
                                  vox.feats, levels)
                return (out ** 2).sum()

            return jax.grad(loss)(variables["params"])

    g_x = step("xla")
    g_p = step("pallas")
    flat_x = jax.tree_util.tree_leaves(g_x)
    flat_p = jax.tree_util.tree_leaves(g_p)
    assert len(flat_x) == len(flat_p)
    for a, b in zip(flat_x, flat_p):
        a, b = np.asarray(a), np.asarray(b)
        # per-leaf criterion: a deep f32 net accumulates benign reordering
        # differences, so compare the largest error against the leaf scale
        d = np.abs(a - b).max()
        assert d <= 5e-3 + 5e-3 * np.abs(a).max(), (a.shape, d)
