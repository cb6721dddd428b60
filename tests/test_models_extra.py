"""AliveUNet (config-driven deep U-Net) smoke tests."""

import numpy as np
import pytest

import jax

from mrcc_tpu.models import AliveUNet
from mrcc_tpu.sparse import build_hierarchy, voxelize

# slow tier: AliveUNet depth-7 compiles — run with --full or scripts/test_on_tpu.py
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def cloud7():
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(1, 1200, 3)).astype(np.float32) * 0.6
    rgb = rng.normal(size=(1, 1200, 3)).astype(np.float32)
    mask = np.ones((1, 1200), bool)
    vox, _, _ = voxelize(pts, rgb, mask, 1 / 100.0, capacity=2048)
    levels = build_hierarchy(vox, depth=7,
                             capacities=(2048, 1024, 512, 256, 128, 64, 64))
    return vox, levels


class TestAliveUNet:
    def test_depth7(self, cloud7):
        vox, levels = cloud7
        net = AliveUNet(in_channels=3, out_channels=5, m=8, depth=7,
                        block_reps=1, block="basic")
        params = jax.jit(net.init)(jax.random.PRNGKey(0), vox.feats, levels)
        out = net.apply(params, vox.feats, levels)
        assert out.shape == (1, 2048, 5)
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_array_equal(
            np.asarray(out)[~np.asarray(levels[0].valid)], 0.0)

    def test_planes_schedule(self):
        net = AliveUNet(in_channels=3, out_channels=3, m=32, depth=7)
        assert net.planes == (32, 64, 96, 128, 160, 192, 224,
                              224, 192, 160, 128, 96, 64, 32)

    def test_bottleneck_depth4(self, cloud7):
        vox, levels = cloud7
        net = AliveUNet(in_channels=3, out_channels=4, m=8, depth=4,
                        block_reps=1, block="bottleneck")
        params = jax.jit(net.init)(jax.random.PRNGKey(1), vox.feats, levels)
        out = net.apply(params, vox.feats, levels)
        assert out.shape == (1, 2048, 4)
