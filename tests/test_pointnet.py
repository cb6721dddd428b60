"""Dense point models: ops oracles + PointNet/PointNet2 shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrcc_tpu.models.pointnet2 import PointNet, PointNet2MSGEncoder, PointNet2SSG
from mrcc_tpu.ops.points import (
    farthest_point_sample,
    index_points,
    query_ball_point,
    square_distance,
    three_nn_interpolate,
)


class TestOps:
    def test_square_distance(self, rng):
        a = rng.normal(size=(2, 16, 3)).astype(np.float32)
        b = rng.normal(size=(2, 8, 3)).astype(np.float32)
        got = np.asarray(square_distance(jnp.asarray(a), jnp.asarray(b)))
        want = ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_fps_spread(self, rng):
        # FPS must cover the cloud better than the first-k points
        pts = rng.normal(size=(1, 512, 3)).astype(np.float32)
        idx = np.asarray(farthest_point_sample(jnp.asarray(pts), 32))[0]
        assert len(np.unique(idx)) == 32
        sel = pts[0][idx]
        d_fps = np.min(
            ((pts[0][:, None] - sel[None]) ** 2).sum(-1), axis=1).max()
        d_first = np.min(
            ((pts[0][:, None] - pts[0][:32][None]) ** 2).sum(-1), axis=1).max()
        assert d_fps < d_first

    def test_fps_matches_numpy_oracle(self, rng):
        from mrcc_tpu.data.labels import farthest_point_sample_idx

        pts = rng.normal(size=(64, 3)).astype(np.float32)
        got = np.asarray(farthest_point_sample(jnp.asarray(pts[None]), 16,
                                               start_idx=0))[0]
        # numpy oracle with the same start index
        n = len(pts)
        dist = np.full(n, 1e10)
        far = 0
        want = []
        for _ in range(16):
            want.append(far)
            d = ((pts - pts[far]) ** 2).sum(-1)
            dist = np.minimum(dist, d)
            far = int(dist.argmax())
        np.testing.assert_array_equal(got, want)

    def test_ball_query_semantics(self, rng):
        pts = rng.uniform(-1, 1, size=(1, 64, 3)).astype(np.float32)
        centers = pts[:, :4]
        idx = np.asarray(query_ball_point(0.5, 8, jnp.asarray(pts),
                                          jnp.asarray(centers)))[0]
        d = ((centers[0][:, None] - pts[0][None]) ** 2).sum(-1)
        for s in range(4):
            within = np.where(d[s] < 0.25)[0]
            want = within[:8]
            got = idx[s][:len(want)]
            np.testing.assert_array_equal(got, want)
            if len(within) < 8:  # padded with first hit
                assert (idx[s][len(within):] == within[0]).all()

    def test_three_nn_interpolate_exact(self, rng):
        # fine point coincides with a coarse point -> its value dominates
        coarse = rng.normal(size=(1, 8, 3)).astype(np.float32)
        feats = rng.normal(size=(1, 8, 4)).astype(np.float32)
        fine = coarse[:, :3].copy()
        got = np.asarray(three_nn_interpolate(jnp.asarray(fine),
                                              jnp.asarray(coarse),
                                              jnp.asarray(feats)))
        np.testing.assert_allclose(got[0], feats[0, :3], atol=1e-3)

    def test_index_points(self, rng):
        pts = rng.normal(size=(2, 10, 3)).astype(np.float32)
        idx = np.array([[1, 3], [5, 7]], np.int32)
        got = np.asarray(index_points(jnp.asarray(pts), jnp.asarray(idx)))
        np.testing.assert_allclose(got[0, 0], pts[0, 1])
        np.testing.assert_allclose(got[1, 1], pts[1, 7])


class TestModels:
    @pytest.mark.slow
    def test_pointnet2_ssg(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 2048, 6)).astype(np.float32))
        net = PointNet2SSG(num_classes=6)
        params = net.init({"params": jax.random.PRNGKey(0)}, x)
        logits, l4 = net.apply(params, x)
        assert logits.shape == (2, 2048, 6)
        assert np.isfinite(np.asarray(logits)).all()

    def test_pointnet(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 6, 10)).astype(np.float32))
        net = PointNet(out_channels=7)
        params = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(params, x)
        assert out.shape == (2, 7)

    @pytest.mark.slow
    def test_pointnet2_msg_encoder(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 512, 6)).astype(np.float32))
        net = PointNet2MSGEncoder(num_classes=16)
        params = net.init(jax.random.PRNGKey(0), x)
        out, emb = net.apply(params, x)
        assert out.shape == (2, 16)
        assert emb.shape == (2, 1024)


class TestMetricLearning:
    def test_triplet_loss_separates(self, rng):
        from mrcc_tpu.train.metric_learning import triplet_margin_loss

        labels = jnp.asarray(np.repeat(np.arange(4), 4))
        # well-separated clusters -> near-zero loss
        emb_good = jnp.asarray(
            (np.repeat(np.eye(4), 4, axis=0) * 10
             + rng.normal(size=(16, 4)) * 0.01).astype(np.float32))
        # random embeddings -> positive loss
        emb_bad = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
        l_good = float(triplet_margin_loss(emb_good, labels))
        l_bad = float(triplet_margin_loss(emb_bad, labels))
        assert l_good < 0.01
        assert l_bad > l_good

    @pytest.mark.slow
    def test_featurenet_embedding(self, rng):
        from mrcc_tpu.data.ycb import YCBDataset
        from mrcc_tpu.models.featurenet import FeatureNet
        from mrcc_tpu.sparse import build_hierarchy, voxelize

        ds = YCBDataset(num_classes=3, samples_per_class=2, max_points=512)
        batch = ds.collate([ds[i] for i in range(4)])
        vox, _, _ = voxelize(jnp.asarray(batch["points"]),
                             jnp.asarray(batch["feats"]),
                             jnp.asarray(batch["mask"]), 1 / 200.0, 512)
        levels = build_hierarchy(vox, 4, capacities=(256, 128, 64, 64))
        net = FeatureNet(in_channels=3, out_channels=16,
                         backbone="minkunet14A")
        params = net.init(jax.random.PRNGKey(0), vox.feats, levels)
        emb = net.apply(params, vox.feats, levels)
        assert emb.shape == (4, 16)
        assert np.isfinite(np.asarray(emb)).all()


class TestDense:
    def test_dense_dataset(self, rng):
        from mrcc_tpu.data.dataset import DataConfig
        from mrcc_tpu.data.dense import AliveV2DenseDataset
        from mrcc_tpu.data.synthetic import generate_sample

        sample = generate_sample(seed=21, n_ee=3000, n_arm=500, n_bg=500)
        cfg = DataConfig(data_type="ee_seg", keypoints_enabled=True,
                         num_of_keypoints=6, center_at_origin=True)
        ds = AliveV2DenseDataset(samples=[sample], cfg=cfg, num_points=2048)
        item = ds[0]
        assert item is not None
        assert item["points"].shape == (2048, 3)
        batch = ds.collate([item])
        assert batch["points"].shape == (1, 2048, 3)

    def test_dense_too_few_points(self, rng):
        from mrcc_tpu.data.dataset import DataConfig
        from mrcc_tpu.data.dense import AliveV2DenseDataset
        from mrcc_tpu.data.synthetic import generate_sample

        sample = generate_sample(seed=22, n_ee=100, n_arm=100, n_bg=100)
        cfg = DataConfig(data_type="ee_seg", center_at_origin=True)
        ds = AliveV2DenseDataset(samples=[sample], cfg=cfg, num_points=2048)
        assert ds[0] is None
