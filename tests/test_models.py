"""Model zoo: shape, masking, determinism and gradient checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrcc_tpu.models import (
    RobotNet,
    RobotNetEncode,
    RobotNetSegmentation,
    RobotNetVote,
    make_minkunet,
)
from mrcc_tpu.sparse import build_hierarchy, voxelize


def make_batch(rng, b=2, p=600, cap=512):
    pts = rng.normal(size=(b, p, 3)).astype(np.float32) * 0.3
    rgb = rng.uniform(-0.5, 0.5, size=(b, p, 3)).astype(np.float32)
    mask = np.ones((b, p), bool)
    if b > 1:
        mask[1, p // 2:] = False  # ragged batch
    vox, pv, _ = voxelize(pts, rgb, mask, 1 / 100.0, capacity=cap)
    levels = build_hierarchy(vox, depth=4,
                             capacities=(cap, cap // 2, cap // 4, cap // 8))
    return vox, pv, levels


# Small variant for cheap tests (full 18D is exercised once, below).
SMALL = dict(backbone="minkunet14A", in_channels=3)


class TestBackbones:
    @pytest.mark.slow
    def test_minkunet_shapes(self, rng):
        vox, _, levels = make_batch(rng)
        net = make_minkunet("minkunet14A", 3, 5)
        params = net.init(jax.random.PRNGKey(0), vox.feats, levels)
        out = net.apply(params, vox.feats, levels)
        assert out.shape == (2, vox.capacity, 5)
        # padding rows stay zero
        np.testing.assert_array_equal(
            np.asarray(out)[~np.asarray(levels[0].valid)], 0.0
        )

    def test_variant_registry(self):
        net = make_minkunet("minkunet", 3, 7)  # default -> 18D
        assert net.planes == (32, 64, 128, 256, 384, 384, 384, 384)
        assert net.layers == (2,) * 8
        net = make_minkunet("minkunet34C", 3, 7)
        assert net.planes == (32, 64, 128, 256, 256, 128, 96, 96)
        assert net.layers == (2, 3, 4, 6, 2, 2, 2, 2)
        net = make_minkunet("minkunet101", 3, 7)
        assert net.block == "bottleneck"

    @pytest.mark.slow
    def test_batch_item_independence(self, rng):
        # masked-out half of item 1 must not change item 0's output
        vox, _, levels = make_batch(rng)
        net = make_minkunet("minkunet14A", 3, 4)
        params = net.init(jax.random.PRNGKey(0), vox.feats, levels)
        out = net.apply(params, vox.feats, levels)

        # corrupt padding-row features of item 1; output of item 0 unchanged
        feats2 = np.asarray(vox.feats).copy()
        feats2[1][~np.asarray(levels[0].valid[1])] = 99.0
        out2 = net.apply(params, jnp.asarray(feats2), levels)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out2[0]),
                                   atol=1e-5)


class TestHeads:
    @pytest.mark.slow
    def test_robotnet_pose(self, rng):
        vox, _, levels = make_batch(rng)
        net = RobotNet(out_channels=7, **SMALL)
        params = net.init(jax.random.PRNGKey(0), vox.feats, levels)
        out = net.apply(params, vox.feats, levels, train=False)
        assert out.shape == (2, 7)
        # eval-mode quaternion is normalized
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out)[:, 3:7], axis=-1), 1.0, atol=1e-5
        )

    @pytest.mark.slow
    def test_robotnet_confidence(self, rng):
        vox, _, levels = make_batch(rng)
        net = RobotNet(out_channels=10, **SMALL)
        params = net.init(jax.random.PRNGKey(0), vox.feats, levels)
        out, _ = net.apply(params, vox.feats, levels, train=True,
                           mutable=["batch_stats"])
        out = np.asarray(out)
        assert out.shape == (2, 10)
        assert ((out[:, 7:] >= 0) & (out[:, 7:] <= 1)).all()

    def test_robotnet_joint_angles(self, rng):
        vox, _, levels = make_batch(rng)
        ja = jnp.asarray(rng.normal(size=(2, 9)).astype(np.float32))
        net = RobotNet(out_channels=7, use_joint_angles=True, **SMALL)
        params = net.init(jax.random.PRNGKey(0), vox.feats, levels, ja)
        out = net.apply(params, vox.feats, levels, ja)
        assert out.shape == (2, 7)

    def test_robotnet_encode(self, rng):
        vox, _, levels = make_batch(rng)
        net = RobotNetEncode(out_channels=7, voxelize_position=True,
                             quantization_size=0.01, **SMALL)
        net_raw = RobotNetEncode(out_channels=7, voxelize_position=False,
                                 **SMALL)
        params = net.init(jax.random.PRNGKey(0), vox.feats, levels)
        out_eval = net.apply(params, vox.feats, levels, train=False)
        out_raw = net_raw.apply(params, vox.feats, levels, train=False)
        assert out_eval.shape == (2, 7)
        # eval positions get un-voxelized by quantization_size
        np.testing.assert_allclose(
            np.asarray(out_eval)[:, :3],
            np.asarray(out_raw)[:, :3] * 0.01,
            atol=1e-6,
        )

    @pytest.mark.slow
    def test_segmentation(self, rng):
        vox, pv, levels = make_batch(rng)
        net = RobotNetSegmentation(num_classes=3, **SMALL)
        params = net.init(jax.random.PRNGKey(0), vox.feats, levels)
        out = net.apply(params, vox.feats, levels)
        assert out.shape == (2, vox.capacity, 3)

    @pytest.mark.slow
    def test_vote(self, rng):
        vox, _, levels = make_batch(rng)
        net = RobotNetVote(num_classes=2, **SMALL)
        params = net.init(jax.random.PRNGKey(0), vox.feats, levels)
        out = net.apply(params, vox.feats, levels)
        assert out.shape == (2, vox.capacity, 2)

    @pytest.mark.slow
    def test_train_step_grad(self, rng):
        vox, _, levels = make_batch(rng)
        net = RobotNetSegmentation(num_classes=3, **SMALL)
        variables = net.init(jax.random.PRNGKey(0), vox.feats, levels)
        labels = jnp.asarray(rng.integers(0, 3, size=(2, vox.capacity)))

        def loss_fn(params):
            logits, updates = net.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                vox.feats, levels, train=True, mutable=["batch_stats"],
            )
            ll = -jax.nn.log_softmax(logits)[
                jnp.arange(2)[:, None], jnp.arange(vox.capacity)[None], labels
            ]
            return (ll * levels[0].valid).sum() / levels[0].valid.sum()

        g = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        total = sum(float(jnp.abs(l).sum()) for l in leaves)
        assert total > 0


@pytest.mark.slow
class TestFullSize:
    def test_minkunet18d_compiles(self, rng):
        # one pass through the flagship backbone (small cloud, jit)
        vox, _, levels = make_batch(rng, b=1, p=400, cap=256)
        net = RobotNetSegmentation(backbone="minkunet", in_channels=3,
                                   num_classes=3)
        params = net.init(jax.random.PRNGKey(0), vox.feats, levels)
        out = jax.jit(lambda f: net.apply(params, f, levels))(vox.feats)
        assert out.shape == (1, 256, 3)
        assert np.isfinite(np.asarray(out)).all()
