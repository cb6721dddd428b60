"""Solve layer: ICP refinement, clustering, keypoint->pose, vote centre."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from mrcc_tpu.data.synthetic import ee_template_points, generate_sample
from mrcc_tpu.geometry.metrics import compute_pose_metrics
from mrcc_tpu.solve import (
    REFERENCE_KEY_POINTS,
    default_template,
    icp_refine,
    key_point_predictions,
    largest_cluster_mask,
    pose_from_key_points,
    pred_center,
    predict_translation,
)
from mrcc_tpu.data.labels import quat_to_matrix_np


def posed_ee_cloud(rng, pose, n=3000, noise=0.001):
    pts = ee_template_points(rng, n)
    rot = quat_to_matrix_np(pose[3:7])
    return (pts @ rot.T + pose[:3] + rng.normal(size=(n, 3)) * noise).astype(
        np.float32)


def perturb_pose(rng, pose, dt=0.02, dr=0.1):
    q = pose[3:7]
    dq = Rotation.from_rotvec(rng.normal(size=3) * dr)
    q_scipy = np.concatenate([q[1:], q[:1]])
    q_new = (Rotation.from_quat(q_scipy) * dq).as_quat()
    return np.concatenate([
        pose[:3] + rng.normal(size=3) * dt,
        [q_new[3]], q_new[:3],
    ]).astype(np.float32)


class TestICP:
    def test_refines_perturbed_pose(self, rng):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        gt = np.concatenate([[0.2, -0.1, 0.9], q]).astype(np.float32)
        cloud = posed_ee_cloud(rng, gt)
        init = perturb_pose(rng, gt, dt=0.015, dr=0.08)

        m0 = compute_pose_metrics(gt, init)
        template = default_template(1024)
        refined = np.asarray(icp_refine(jnp.asarray(template),
                                        jnp.asarray(cloud),
                                        jnp.ones(len(cloud), bool),
                                        jnp.asarray(init)))
        m1 = compute_pose_metrics(gt, refined)
        assert float(m1["dist_position"]) < float(m0["dist_position"])
        assert float(m1["dist_position"]) < 0.01
        assert float(m1["angle_diff"]) < 0.1

    def test_empty_cloud_returns_init(self, rng):
        init = np.array([0.1, 0.2, 0.3, 1, 0, 0, 0], np.float32)
        template = default_template(256)
        out = np.asarray(icp_refine(jnp.asarray(template),
                                    jnp.zeros((128, 3), np.float32),
                                    jnp.zeros(128, bool),
                                    jnp.asarray(init)))
        np.testing.assert_allclose(out, init, atol=1e-6)

    def test_masked_padding_ignored(self, rng):
        q = np.array([1.0, 0, 0, 0], np.float32)
        gt = np.concatenate([[0.0, 0.0, 0.8], q]).astype(np.float32)
        cloud = posed_ee_cloud(rng, gt, n=2000)
        padded = np.concatenate([cloud, np.full((500, 3), 50.0, np.float32)])
        mask = np.concatenate([np.ones(2000, bool), np.zeros(500, bool)])
        init = perturb_pose(rng, gt, dt=0.01, dr=0.05)
        refined = np.asarray(icp_refine(jnp.asarray(default_template(1024)),
                                        jnp.asarray(padded), jnp.asarray(mask),
                                        jnp.asarray(init)))
        m = compute_pose_metrics(gt, refined)
        assert float(m["dist_position"]) < 0.01


class TestCluster:
    def test_two_blobs(self, rng):
        a = rng.normal(size=(300, 3)) * 0.01          # dense blob at origin
        b = rng.normal(size=(80, 3)) * 0.01 + 1.0     # smaller blob at (1,1,1)
        pts = np.concatenate([a, b]).astype(np.float32)
        mask = np.ones(len(pts), bool)
        got = np.asarray(largest_cluster_mask(jnp.asarray(pts),
                                              jnp.asarray(mask)))
        assert got[:300].all()
        assert not got[300:].any()

    def test_chain_connectivity(self, rng):
        # a chain of points spaced 0.03 (< 0.06) must form ONE cluster
        chain = np.stack([np.arange(50) * 0.03, np.zeros(50), np.zeros(50)], 1)
        stray = np.array([[5.0, 5.0, 5.0]])
        pts = np.concatenate([chain, stray]).astype(np.float32)
        got = np.asarray(largest_cluster_mask(jnp.asarray(pts),
                                              jnp.ones(51, bool)))
        assert got[:50].all() and not got[50]

    def test_padding_excluded(self, rng):
        pts = np.zeros((100, 3), np.float32)
        pts[:10] = rng.normal(size=(10, 3)) * 0.01 + 2.0
        mask = np.zeros(100, bool)
        mask[:10] = True
        got = np.asarray(largest_cluster_mask(jnp.asarray(pts),
                                              jnp.asarray(mask)))
        assert got[:10].all() and not got[10:].any()

    @staticmethod
    def _sklearn_largest(pts, dist=0.06):
        """The reference oracle: utils/output.py:13-28."""
        from sklearn.cluster import AgglomerativeClustering

        labels = AgglomerativeClustering(
            n_clusters=None, linkage="single", distance_threshold=dist,
        ).fit_predict(pts)
        counts = np.bincount(labels)
        return labels == counts.argmax()

    def test_sklearn_oracle_boundary_blobs(self, rng):
        # blobs separated by 0.07-0.15 m sit just beyond the 0.06 linkage:
        # sklearn keeps them apart and so must we (the round-1 grid linkage
        # over-linked up to ~2x dist here)
        for gap in (0.07, 0.08, 0.10, 0.15):
            a = rng.normal(size=(200, 3)).astype(np.float32) * 0.004
            b = rng.normal(size=(120, 3)).astype(np.float32) * 0.004
            b[:, 0] += gap
            pts = np.concatenate([a, b])
            want = self._sklearn_largest(pts)
            got = np.asarray(largest_cluster_mask(
                jnp.asarray(pts), jnp.ones(len(pts), bool)))
            np.testing.assert_array_equal(got, want, err_msg=f"gap={gap}")

    def test_sklearn_oracle_random_segmentation_shaped(self, rng):
        # segmentation-shaped data: a dense EE blob + arm remnants + strays
        for trial in range(5):
            ee = rng.normal(size=(400, 3)).astype(np.float32) * 0.03
            arm = rng.normal(size=(150, 3)).astype(np.float32) * 0.02
            arm[:, 2] += 0.30
            strays = rng.uniform(-1, 1, size=(30, 3)).astype(np.float32)
            pts = np.concatenate([ee, arm, strays])
            want = self._sklearn_largest(pts)
            got = np.asarray(largest_cluster_mask(
                jnp.asarray(pts), jnp.ones(len(pts), bool)))
            np.testing.assert_array_equal(got, want, err_msg=f"trial={trial}")

    def test_sklearn_oracle_within_dist_pairs_linked(self, rng):
        # pairs just UNDER dist must merge (the round-1 grid linkage could
        # split these when they landed 2 cells apart on one axis)
        base = rng.normal(size=(50, 3)).astype(np.float32) * 0.002
        bridge = np.array([[0.059, 0.0, 0.0]], np.float32)
        far = rng.normal(size=(60, 3)).astype(np.float32) * 0.002
        far[:, 0] += 0.059 + 0.059  # chained through the bridge point
        pts = np.concatenate([base, bridge, far])
        want = self._sklearn_largest(pts)
        got = np.asarray(largest_cluster_mask(
            jnp.asarray(pts), jnp.ones(len(pts), bool)))
        np.testing.assert_array_equal(got, want)
        assert got.all()  # everything is one chain -> one cluster


class TestKeypoints:
    def test_predictions_threshold(self, rng):
        logits = np.full((100, 6), -5.0, np.float32)
        for k in range(4):          # 4 confident classes
            logits[k * 10, k] = 10.0
        logits[80] = 0.0             # uniform row: classes 4/5 stay uncertain
        idx, found, conf = key_point_predictions(jnp.asarray(logits),
                                                 jnp.ones(100, bool), 0.75)
        found = np.asarray(found)
        assert found[:4].all() and not found[4:].any()
        np.testing.assert_array_equal(np.asarray(idx)[:4],
                                      [0, 10, 20, 30])

    def test_pose_from_keypoints(self, rng):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        gt = np.concatenate([[0.3, 0.1, 1.1], q])
        rot = quat_to_matrix_np(q)
        kp = REFERENCE_KEY_POINTS @ rot.T + gt[:3]
        found = np.array([True] * 5 + [False])
        kp_noisy = kp.copy()
        kp_noisy[5] = 99.0  # unfound slot contains garbage
        pose, ok = pose_from_key_points(jnp.asarray(kp_noisy, jnp.float32),
                                        jnp.asarray(found))
        assert bool(ok)
        m = compute_pose_metrics(jnp.asarray(gt), pose)
        assert float(m["dist_position"]) < 1e-4
        assert float(m["angle_diff"]) < 1e-3

    def test_too_few_keypoints(self, rng):
        found = np.array([True, True, True, False, False, False])
        _, ok = pose_from_key_points(
            jnp.asarray(REFERENCE_KEY_POINTS), jnp.asarray(found))
        assert not bool(ok)


class TestVoteAndTranslation:
    def test_pred_center(self, rng):
        coords = rng.normal(size=(200, 3)).astype(np.float32)
        logits = np.zeros((200, 2), np.float32)
        target = coords[:8].mean(0)
        logits[:8, 1] = 10.0
        got = np.asarray(pred_center(jnp.asarray(logits), jnp.asarray(coords),
                                     jnp.ones(200, bool)))
        # without an orientation the offset is not applied (output.py:50)
        np.testing.assert_allclose(got, target, atol=1e-5)

    def test_pred_center_rotated_offset(self, rng):
        coords = np.zeros((16, 3), np.float32)
        logits = np.zeros((16, 2), np.float32)
        logits[:8, 1] = 5.0
        q = np.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)], np.float32)
        got = np.asarray(pred_center(jnp.asarray(logits), jnp.asarray(coords),
                                     jnp.ones(16, bool), q=jnp.asarray(q)))
        # 90° about z maps [-r,0,0] -> [0,-r,0]
        np.testing.assert_allclose(got, [0, -0.03, 0], atol=1e-6)

    def test_translation_magic(self, rng):
        # identity orientation: position = [magic_x + cx, cy, min_z_world]
        pts = rng.uniform(-0.1, 0.1, size=(500, 3)).astype(np.float32)
        pts += np.array([0.4, 0.2, 0.9], np.float32)
        pos, _ = predict_translation(jnp.asarray(pts),
                                     jnp.ones(500, bool),
                                     jnp.asarray([1.0, 0, 0, 0], jnp.float32))
        pos = np.asarray(pos)
        c = (pts.max(0) + pts.min(0)) / 2
        np.testing.assert_allclose(pos[0], c[0] - 0.015, atol=1e-5)
        np.testing.assert_allclose(pos[1], c[1], atol=1e-5)
        np.testing.assert_allclose(pos[2], pts[:, 2].min(), atol=1e-5)

    def test_translation_percentile_z_robust(self, rng):
        # ROADMAP r5 #3: one stray voxel 10 cm below the gripper moves the
        # hard min by 10 cm; the percentile variant stays on the body
        pts = rng.uniform(-0.05, 0.05, size=(511, 3)).astype(np.float32)
        stray = np.array([[0.0, 0.0, -0.15]], np.float32)
        all_pts = np.concatenate([pts, stray])
        q = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
        mask = jnp.ones(512, bool)
        pos_min, _ = predict_translation(jnp.asarray(all_pts), mask, q)
        pos_pct, _ = predict_translation(jnp.asarray(all_pts), mask, q,
                                         z_percentile=2.0)
        # min-z path follows the stray; percentile ignores it
        np.testing.assert_allclose(np.asarray(pos_min)[2], -0.15, atol=1e-5)
        z = np.sort(all_pts[:, 2])
        want = z[int(round(0.02 * 511))]
        np.testing.assert_allclose(np.asarray(pos_pct)[2], want, atol=1e-5)
        # padding never enters the percentile
        padded = np.concatenate([all_pts,
                                 np.full((512, 3), 99.0, np.float32)])
        m2 = jnp.concatenate([mask, jnp.zeros(512, bool)])
        pos_pad, _ = predict_translation(jnp.asarray(padded), m2, q,
                                         z_percentile=2.0)
        np.testing.assert_allclose(np.asarray(pos_pad)[2], want, atol=1e-5)


class TestSymmetryFlip:
    """ROADMAP r5 #2: keypoint-guided gripper-symmetry disambiguation."""

    def _setup(self, rng):
        from mrcc_tpu.geometry.quaternion import qmul

        ang = np.deg2rad(30)
        q_gt = np.array([np.cos(ang / 2), np.sin(ang / 2), 0, 0], np.float32)
        zflip = np.array([0, 0, 0, 1], np.float32)
        q_wrong = np.asarray(qmul(jnp.asarray(q_gt), jnp.asarray(zflip)))
        pts = rng.uniform(-0.05, 0.05, size=(256, 3)).astype(np.float32)
        pts[:, 0] += 0.3  # asymmetric crop: flip changes the magic point
        return q_gt, q_wrong, jnp.asarray(pts), jnp.ones(256, bool)

    def test_flip_corrected(self, rng):
        from mrcc_tpu.solve.symmetry import _quat_angle, disambiguate_flip

        q_gt, q_wrong, pts, mask = self._setup(rng)
        pos_w, _ = predict_translation(pts, mask, jnp.asarray(q_wrong))
        ee_pose = jnp.concatenate([pos_w, jnp.asarray(q_wrong)])
        kp_pose = jnp.concatenate([pos_w, jnp.asarray(q_gt)])
        out, flipped = disambiguate_flip(ee_pose, kp_pose,
                                         jnp.asarray(True), pts, mask)
        assert bool(flipped)
        assert float(_quat_angle(out[3:7], jnp.asarray(q_gt))) < 1e-4
        # translation recomputed under the corrected orientation
        pos_c, _ = predict_translation(pts, mask, out[3:7])
        np.testing.assert_allclose(np.asarray(out[:3]), np.asarray(pos_c),
                                   atol=1e-6)
        assert not np.allclose(np.asarray(out[:3]), np.asarray(pos_w),
                               atol=1e-4)

    def test_correct_pose_untouched(self, rng):
        from mrcc_tpu.solve.symmetry import disambiguate_flip

        q_gt, _, pts, mask = self._setup(rng)
        pos, _ = predict_translation(pts, mask, jnp.asarray(q_gt))
        ee_pose = jnp.concatenate([pos, jnp.asarray(q_gt)])
        out, flipped = disambiguate_flip(ee_pose, ee_pose,
                                         jnp.asarray(True), pts, mask)
        assert not bool(flipped)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ee_pose),
                                   atol=1e-6)

    def test_kp_not_ok_keeps_nn_pose(self, rng):
        from mrcc_tpu.solve.symmetry import disambiguate_flip

        q_gt, q_wrong, pts, mask = self._setup(rng)
        pos_w, _ = predict_translation(pts, mask, jnp.asarray(q_wrong))
        ee_pose = jnp.concatenate([pos_w, jnp.asarray(q_wrong)])
        kp_pose = jnp.concatenate([pos_w, jnp.asarray(q_gt)])
        out, flipped = disambiguate_flip(ee_pose, kp_pose,
                                         jnp.asarray(False), pts, mask)
        assert not bool(flipped)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ee_pose),
                                   atol=1e-6)


class TestClusterProductionScale:
    """VERDICT r2 #8: production EE crops exceed 4096 points — the engine's
    cluster capacity now scales with the crop (cluster_capacity())."""

    @staticmethod
    def _sklearn_largest(pts, dist=0.06):
        from sklearn.cluster import AgglomerativeClustering

        labels = AgglomerativeClustering(
            n_clusters=None, linkage="single", distance_threshold=dist,
        ).fit_predict(pts)
        counts = np.bincount(labels)
        return labels == counts.argmax()

    def test_sklearn_oracle_8k_points(self, rng):
        # 8192-point production-scale crop: dense EE blob + arm + strays
        ee = rng.normal(size=(5000, 3)).astype(np.float32) * 0.03
        arm = rng.normal(size=(2500, 3)).astype(np.float32) * 0.02
        arm[:, 2] += 0.30
        strays = rng.uniform(-1, 1, size=(692, 3)).astype(np.float32)
        pts = np.concatenate([ee, arm, strays])
        want = self._sklearn_largest(pts)
        got = np.asarray(largest_cluster_mask(
            jnp.asarray(pts), jnp.ones(len(pts), bool), capacity=8192))
        np.testing.assert_array_equal(got, want)

    def test_engine_capacity_scales_with_crop(self):
        from mrcc_tpu.app.inference_engine import (InferenceConfig,
                                                   cluster_capacity)

        assert cluster_capacity(InferenceConfig()) == 8192
        assert cluster_capacity(
            InferenceConfig(ee_point_capacity=2048)) == 4096
        assert cluster_capacity(
            InferenceConfig(ee_point_capacity=16384)) == 16384
        assert cluster_capacity(
            InferenceConfig(cluster_capacity=512)) == 512
