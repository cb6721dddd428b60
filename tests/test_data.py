"""Data layer: synthetic generator, label generation, dataset pipeline."""

import numpy as np
import pytest

from mrcc_tpu.data import (
    AliveV2Dataset,
    DataConfig,
    generate_sample,
    gt_base2cam_pose,
    write_sample_set,
)
from mrcc_tpu.data.labels import (
    KEY_POINTS_6,
    farthest_point_sample_idx,
    get_6_key_points,
    get_ee_cross_section_idx,
    get_ee_idx,
    get_key_points,
    get_roi_mask,
    quat_to_matrix_np,
)


@pytest.fixture(scope="module")
def sample():
    return generate_sample(seed=42)


def wxyz_pose(sample):
    p = sample["pose"]
    return np.concatenate([p[:3], p[6:7], p[3:6]])


class TestSynthetic:
    def test_schema(self, sample):
        assert set(sample) >= {"points", "rgb", "labels", "instance_labels",
                               "pose", "joint_angles"}
        n = len(sample["points"])
        assert sample["rgb"].shape == (n, 3)
        assert sample["labels"].shape == (n,)
        assert sorted(np.unique(sample["labels"])) == [0.0, 1.0, 2.0]
        assert sample["pose"].shape == (7,)
        assert sample["joint_angles"].shape == (9,)

    def test_ee_points_near_pose(self, sample):
        pose = wxyz_pose(sample)
        ee = sample["points"][sample["labels"] == 2]
        d = np.linalg.norm(ee - pose[:3], axis=1)
        assert d.max() < 0.30  # EE extent ~0.12m + noise

    def test_ee_geometric_recovery(self, sample):
        # get_ee_idx with the gt pose must recover essentially the EE points
        # that lie inside the reference's EE bbox (the synthetic wrist/fin
        # extend below its min_z=-0.006, like the real hand's mount)
        pose = wxyz_pose(sample)
        idx = get_ee_idx(sample["points"], pose)
        rot = quat_to_matrix_np(pose[3:7])
        local = (sample["points"] - pose[:3]) @ rot
        in_bbox = local[:, 2] > -0.006
        gt = set(np.where((sample["labels"] == 2) & in_bbox)[0])
        got = set(idx.tolist())
        inter = len(gt & got)
        assert inter / len(gt) > 0.95

    def test_base2cam_consistency(self, sample):
        # chaining the EE camera pose with the stored ee2base must give the
        # fixed synthetic extrinsic
        from mrcc_tpu.geometry import base2cam_pose

        pose = wxyz_pose(sample)
        b2c = np.asarray(base2cam_pose(pose, sample["ee2base_pose"]))
        want = gt_base2cam_pose()
        np.testing.assert_allclose(b2c[:3], want[:3], atol=1e-4)
        # the reference's config extrinsic quaternion is not unit-norm
        want_q = want[3:] / np.linalg.norm(want[3:])
        d = min(np.linalg.norm(b2c[3:] - want_q),
                np.linalg.norm(b2c[3:] + want_q))
        assert d < 1e-3

    def test_write_sample_set(self, tmp_path):
        splits = write_sample_set(tmp_path, n=3, n_ee=512, n_arm=512, n_bg=1024)
        assert (tmp_path / "labeled" / "1.pickle").exists()
        assert (tmp_path / "sample_splits.json").exists()
        assert len(splits["train"]) >= 1


class TestLabels:
    def test_roi_mask(self, rng):
        pts = rng.uniform(-1, 1, (100, 3))
        m = get_roi_mask(pts, min_x=-0.5, max_x=0.5)
        want = (pts[:, 0] > -0.5) & (pts[:, 0] < 0.5)
        np.testing.assert_array_equal(m, want)

    def test_6_key_points_on_template(self, sample):
        pose = wxyz_pose(sample)
        ee_pts = sample["points"][sample["labels"] == 2]
        kps, kp_idx = get_6_key_points(ee_pts, pose)
        assert kps.shape == (6, 3)
        # found corners + grippers; transform back to EE frame and compare
        # against the canonical template
        rot = quat_to_matrix_np(pose[3:7])
        local = (kps - pose[:3]) @ rot
        err = np.linalg.norm(local - KEY_POINTS_6, axis=1)
        # corners within the matcher threshold; grippers looser (maximize_dim)
        assert (err[:4] < 0.05).all(), err
        assert (err[4:] < 0.08).all(), err
        assert (kp_idx[:4] > -1).all()

    def test_10_key_points(self, sample):
        pose = wxyz_pose(sample)
        ee_pts = sample["points"][sample["labels"] == 2]
        kps, kp_idx = get_key_points(ee_pts, pose)
        assert kps.shape == (10, 3)
        assert (kp_idx[:4] > -1).sum() >= 3  # front corners mostly found

    def test_cross_section(self, sample):
        pose = wxyz_pose(sample)
        ee_pts = sample["points"][sample["labels"] == 2]
        dists, idx = get_ee_cross_section_idx(ee_pts, pose, count=32,
                                              cutoff=0.008)
        assert len(idx) > 0
        assert (dists < 0.008).all()

    def test_fps(self, rng):
        pts = rng.normal(size=(500, 3))
        idx = farthest_point_sample_idx(pts, 64, seed=1)
        assert len(np.unique(idx)) == 64


class TestDataset:
    def test_full_scene_pipeline(self, sample):
        cfg = DataConfig(data_type=None, center_at_origin=True,
                         max_points=32768, scale=200)
        ds = AliveV2Dataset(samples=[sample], cfg=cfg)
        item = ds[0]
        assert item is not None
        # centered: bbox center at origin
        c = (item["points"].max(0) + item["points"].min(0)) / 2
        np.testing.assert_allclose(c, 0, atol=1e-5)
        # pose shifted consistently
        pose = wxyz_pose(sample)
        np.testing.assert_allclose(
            item["pose"][:3], pose[:3] - item["other"]["origin_offset"],
            atol=1e-5)
        # rgb shifted to [-0.5, 0.5]
        assert item["feats"].min() >= -0.5 - 1e-6
        assert item["feats"].max() <= 0.5 + 1e-6

    def test_ee_seg_crop(self, sample):
        cfg = DataConfig(data_type="ee_seg", center_at_origin=True)
        ds = AliveV2Dataset(samples=[sample], cfg=cfg)
        item = ds[0]
        n_ee = int((sample["labels"] == 2).sum())
        assert len(item["points"]) == n_ee

    def test_move_ee_to_origin(self, sample):
        cfg = DataConfig(data_type="ee_seg", move_ee_to_origin=True,
                         center_at_origin=True)
        ds = AliveV2Dataset(samples=[sample], cfg=cfg)
        item = ds[0]
        # in the EE frame the points span the canonical template bbox
        spread = item["points"].max(0) - item["points"].min(0)
        assert spread[1] > spread[0]  # y (width 0.2) > x (depth 0.044)

    def test_keypoint_labels(self, sample):
        cfg = DataConfig(data_type="ee_seg", keypoints_enabled=True,
                         num_of_keypoints=6)
        ds = AliveV2Dataset(samples=[sample], cfg=cfg)
        item = ds[0]
        labs = item["labels"]
        present = np.unique(labs[labs > -100])
        assert len(present) >= 4  # most classes labelled
        assert (labs == -100).sum() > 0

    def test_voting_labels(self, sample):
        cfg = DataConfig(data_type="ee_seg", voting_enabled=True)
        ds = AliveV2Dataset(samples=[sample], cfg=cfg)
        item = ds[0]
        assert set(np.unique(item["labels"])) <= {0, 1}
        assert (item["labels"] == 1).sum() > 0

    def test_collate_padding(self, sample):
        cfg = DataConfig(data_type=None, max_points=50000)
        ds = AliveV2Dataset(samples=[sample, sample], cfg=cfg)
        batch = ds.collate([ds[0], ds[1]])
        assert batch["points"].shape == (2, 50000, 3)
        assert batch["mask"].sum(1).tolist() == [len(sample["points"])] * 2
        assert batch["labels"][~batch["mask"]].min() == -100

    def test_batches_iterator(self, sample):
        cfg = DataConfig(data_type=None, max_points=32768)
        ds = AliveV2Dataset(samples=[sample] * 3, cfg=cfg)
        bs = list(ds.batches(batch_size=2, shuffle=False))
        assert len(bs) == 2
        assert bs[0]["points"].shape[0] == 2
        assert bs[1]["points"].shape[0] == 1

    def test_voxelize_position(self, sample):
        cfg = DataConfig(data_type="ee_seg", voxelize_position=True, scale=200,
                         center_at_origin=False)
        ds = AliveV2Dataset(samples=[sample], cfg=cfg)
        item = ds[0]
        pose = wxyz_pose(sample)
        np.testing.assert_allclose(item["pose"][:3], pose[:3] * 200, rtol=1e-5)
