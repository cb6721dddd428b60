"""int8 quantized conv path: accuracy vs the f32 XLA oracle.

The quantization is per-channel (activations, folded into weights) +
per-output-column (weights): relative error on real conv shapes should be
~1% Frobenius on gaussian data (RMS quant error of a 4-sigma-range
int8 grid IS ~0.9% of signal RMS); real post-ReLU activations quantize
better.  End-to-end accuracy is validated by the trained benchmark
(scripts/train_demo_checkpoints.py --conv-impl pallas-int8).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrcc_tpu.sparse import build_hierarchy, voxelize
from mrcc_tpu.sparse import conv as C
from mrcc_tpu.sparse.impl import sparse_impl

# slow tier: interpret-mode int8 conv oracles — run with --full or scripts/test_on_tpu.py
pytestmark = pytest.mark.slow

B, N, CAP = 2, 384, 256
HCAPS = (128, 128)


@pytest.fixture(scope="module")
def levels_pair():
    rng = np.random.default_rng(11)
    pts = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32) * 0.5)
    rgb = jnp.asarray(rng.random((B, N, 3)).astype(np.float32))
    mask = np.ones((B, N), bool)
    mask[:, N - 40:] = False
    mask = jnp.asarray(mask)

    def mk(impl):
        with sparse_impl(impl):
            vox, _, _ = voxelize(pts, rgb, mask, 1 / 20.0, CAP)
            return build_hierarchy(vox, 2, capacities=HCAPS)

    return mk("xla"), mk("pallas-int8")


def _rel_err(got, want):
    return (np.linalg.norm(got - want)
            / max(np.linalg.norm(want), 1e-9))


def test_q8_k3_close_to_f32(levels_pair, rng):
    lv_x, lv_q = levels_pair
    n = lv_x[0].key.shape[1]
    cin, cout = 48, 64
    feats = jnp.asarray(rng.normal(size=(B, n, cin)), jnp.float32)
    feats = jnp.where(lv_x[0].valid[..., None], feats, 0)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)) / 7, jnp.float32)

    with sparse_impl("xla"):
        want = np.asarray(C.conv_k3(feats, w, lv_x[0]))
    with sparse_impl("pallas-int8"):
        got = np.asarray(C.conv_k3(feats, w, lv_q[0]))
    assert _rel_err(got, want) < 2e-2, _rel_err(got, want)


def test_q8_down_and_up_close_to_f32(levels_pair, rng):
    lv_x, lv_q = levels_pair
    n = lv_x[0].key.shape[1]
    nc = lv_x[1].key.shape[1]
    cin, cout = 32, 32
    feats = jnp.asarray(rng.normal(size=(B, n, cin)), jnp.float32)
    feats = jnp.where(lv_x[0].valid[..., None], feats, 0)
    w = jnp.asarray(rng.normal(size=(8, cin, cout)) / 6, jnp.float32)

    with sparse_impl("xla"):
        want = np.asarray(C.conv_down(feats, w, lv_x[0], lv_x[1]))
    with sparse_impl("pallas-int8"):
        got = np.asarray(C.conv_down(feats, w, lv_q[0], lv_q[1]))
    assert _rel_err(got, want) < 2e-2

    cfeats = jnp.asarray(rng.normal(size=(B, nc, cin)), jnp.float32)
    cfeats = jnp.where(lv_x[1].valid[..., None], cfeats, 0)
    with sparse_impl("xla"):
        want = np.asarray(C.conv_transpose_up(cfeats, w, lv_x[1], lv_x[0]))
    with sparse_impl("pallas-int8"):
        got = np.asarray(C.conv_transpose_up(cfeats, w, lv_q[1], lv_q[0]))
    assert _rel_err(got, want) < 2e-2


def test_q8_channel_split_shapes(rng):
    """Wide channels force the int8 channel-group split (c_g = 256)."""
    from mrcc_tpu.ops.conv_pallas import (_split_plan, build_tiled_maps,
                                          gather_gemm_conv_tiled_q8)
    from mrcc_tpu.sparse.conv import conv_kernel_map

    k, b, n, cin, cout = 27, 1, 256, 416, 96
    c_g, n_cg, _, kg, n_kg, pack = _split_plan(n, cin, k, 32, itemsize=1)
    assert c_g == 256 and n_cg == 2 and kg == 27 and n_kg == 1
    assert pack == 1

    base = np.arange(n)
    idx = np.zeros((k, b, n), np.int32)
    for ki in range(k):
        shift = rng.integers(-n // 4, n // 4)
        idx[ki, 0] = np.sort(np.clip(base + shift, 0, n - 1))
    hit = rng.random((k, b, n)) < 0.7
    feats = jnp.asarray(rng.normal(size=(b, n, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, cin, cout)) / 20, jnp.float32)
    valid = jnp.ones((b, n), bool)

    tiled = build_tiled_maps(jnp.asarray(idx), jnp.asarray(hit), n)
    got = np.asarray(gather_gemm_conv_tiled_q8(feats, w, tiled, valid, k=k))
    want = np.asarray(conv_kernel_map(feats, w, jnp.asarray(idx),
                                      jnp.asarray(hit), valid))
    assert _rel_err(got, want) < 2e-2


def test_q8_static_calibrated_scales(levels_pair, rng):
    """Calibrated act_absmax == dynamic absmax => bit-identical conv; a
    calibration apply records the collection and later applies use it
    (sparse/nn.py _q8_calibration)."""
    from mrcc_tpu.sparse.nn import SparseConvK3

    lv_x, lv_q = levels_pair
    n = lv_x[0].key.shape[1]
    cin, cout = 32, 48
    feats = jnp.asarray(rng.normal(size=(B, n, cin)), jnp.float32)
    feats = jnp.where(lv_q[0].valid[..., None], feats, 0)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)) / 7, jnp.float32)

    # function-level: static scale equal to the true absmax is identical
    with sparse_impl("pallas-int8"):
        dyn = np.asarray(C.conv_k3(feats, w, lv_q[0]))
        amax = jnp.abs(feats).max(axis=(0, 1))
        stat = np.asarray(C.conv_k3(feats, w, lv_q[0], act_absmax=amax))
    np.testing.assert_array_equal(dyn, stat)

    # module-level: init has no q8_stats; calibration apply records it;
    # a later apply carrying the collection matches the dynamic path
    mod = SparseConvK3(cout)
    with sparse_impl("pallas-int8"):
        vars0 = mod.init(jax.random.PRNGKey(0), feats, lv_q[0])
        assert "q8_stats" not in vars0
        out_dyn, upd = mod.apply(vars0, feats, lv_q[0],
                                 mutable=["q8_stats"])
        stored = upd["q8_stats"]["act_absmax"]
        np.testing.assert_allclose(np.asarray(stored),
                                   np.abs(np.asarray(feats)).max((0, 1)))
        out_stat = mod.apply({**vars0, **upd}, feats, lv_q[0])
    np.testing.assert_array_equal(np.asarray(out_dyn), np.asarray(out_stat))

    # engine-level: calibrate_q8 threads the collection through all stages
    from mrcc_tpu.app.inference_engine import InferenceConfig, InferenceEngine

    cfg = InferenceConfig(conv_impl="pallas-int8", icp_enabled=False,
                          seg_voxel_capacity=256, ee_voxel_capacity=128,
                          kp_voxel_capacity=128, ee_point_capacity=256,
                          seg_hierarchy_caps=(128, 64, 64, 64),
                          ee_hierarchy_caps=(64, 64, 64, 64),
                          kp_hierarchy_caps=(64, 64, 64, 64))
    eng = InferenceEngine(cfg)
    pts = jnp.asarray(rng.normal(size=(1, 256, 3)).astype(np.float32) * 0.4)
    rgbp = jnp.asarray(rng.random((1, 256, 3)).astype(np.float32))
    m = jnp.ones((1, 256), bool)
    eng.calibrate_q8(pts, rgbp, m)
    assert "q8_stats" in eng.params["segmentation"]
    assert "q8_stats" in eng.params["rotation"]
