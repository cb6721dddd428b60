"""Sparse ResNet family (classifier path with strided kernel maps)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrcc_tpu.models.resnet_sparse import (
    SparseResFieldNet,
    SparseResNet14,
    SparseResNet50,
)
from mrcc_tpu.sparse import build_hierarchy, voxelize
from mrcc_tpu.sparse.hierarchy import downsample_level


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(2, 800, 3)).astype(np.float32) * 0.3
    rgb = rng.normal(size=(2, 800, 3)).astype(np.float32)
    mask = np.ones((2, 800), bool)
    mask[1, 500:] = False
    vox, _, _ = voxelize(pts, rgb, mask, 1 / 100.0, capacity=1024)
    (l0,) = build_hierarchy(vox, depth=0)
    return vox, l0


class TestDownsampleLevel:
    def test_stride3(self, cloud):
        vox, l0 = cloud
        fine, coarse = downsample_level(l0, 1024, stride=3, kernel_size=3,
                                        build_k3=False)
        off0 = np.asarray(l0.off[0])[np.asarray(l0.valid[0])]
        offc = np.asarray(coarse.off[0])[np.asarray(coarse.valid[0])]
        want = np.unique(off0 // 3, axis=0)
        np.testing.assert_array_equal(
            np.asarray(sorted(map(tuple, offc))),
            np.asarray(sorted(map(tuple, want))))

    def test_k3s2_kernel_map(self, cloud):
        vox, l0 = cloud
        fine, coarse = downsample_level(l0, 512, stride=2, kernel_size=3,
                                        build_k3=False)
        # kernel map: coarse voxel p, offset d -> child at 2p+d
        v0 = np.asarray(l0.valid[0])
        table = {tuple(c): i for i, c in enumerate(np.asarray(l0.off[0]))
                 if v0[i]}
        cidx = np.asarray(coarse.child_idx[:, 0])
        chit = np.asarray(coarse.child_hit[:, 0])
        offs = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                for dz in (-1, 0, 1)]
        vc = np.asarray(coarse.valid[0])
        for j in np.where(vc)[0][:20]:
            p = np.asarray(coarse.off[0])[j]
            for k, d in enumerate(offs):
                c = (p[0] * 2 + d[0], p[1] * 2 + d[1], p[2] * 2 + d[2])
                if c in table:
                    assert chit[k, j]
                    assert cidx[k, j] == table[c]
                else:
                    assert not chit[k, j]


class TestResNets:
    def test_resnet14(self, cloud):
        vox, l0 = cloud
        net = SparseResNet14(3, 5)
        params = jax.jit(net.init)(jax.random.PRNGKey(0), vox.feats, l0)
        out = jax.jit(lambda p, f: net.apply(p, f, l0))(params, vox.feats)
        assert out.shape == (2, 5)
        assert np.isfinite(np.asarray(out)).all()

    @pytest.mark.slow
    def test_resnet50_bottleneck(self, cloud):
        vox, l0 = cloud
        net = SparseResNet50(3, 4)
        params = jax.jit(net.init)(jax.random.PRNGKey(0), vox.feats, l0)
        out = net.apply(params, vox.feats, l0)
        assert out.shape == (2, 4)

    def test_resfieldnet(self, cloud):
        vox, l0 = cloud
        net = SparseResFieldNet(in_channels=3, out_channels=4)
        params = jax.jit(net.init)(jax.random.PRNGKey(1), vox.feats, l0)
        out = net.apply(params, vox.feats, l0)
        assert out.shape == (2, 4)
        assert np.isfinite(np.asarray(out)).all()
