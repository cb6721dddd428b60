"""Geometry core vs independent numpy/scipy oracles.

The oracles below are written directly from the math (not imported from the
reference repo) and cross-checked against scipy where available.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from mrcc_tpu.geometry import calibration as calib
from mrcc_tpu.geometry import kabsch as kb
from mrcc_tpu.geometry import metrics as met
from mrcc_tpu.geometry import preprocess as prep
from mrcc_tpu.geometry import quaternion as quat
from mrcc_tpu.geometry import transform as tf


def random_unit_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def to_scipy(q_wxyz):
    """WXYZ -> scipy's XYZW."""
    return np.concatenate([q_wxyz[..., 1:], q_wxyz[..., :1]], axis=-1)


class TestQuaternion:
    def test_qmul_matches_scipy(self, rng):
        q = random_unit_quats(rng, 32)
        r = random_unit_quats(rng, 32)
        got = np.asarray(quat.qmul(q, r))
        want = to_scipy_inv(
            (Rotation.from_quat(to_scipy(q)) * Rotation.from_quat(to_scipy(r))).as_quat()
        )
        assert quat_allclose(got, want, atol=1e-6)

    def test_qrot_matches_matrix(self, rng):
        q = random_unit_quats(rng, 32)
        v = rng.normal(size=(32, 3))
        got = np.asarray(quat.qrot(q, v))
        want = Rotation.from_quat(to_scipy(q)).apply(v)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_qeuler_roundtrip(self, rng):
        for order in ["xyz", "yzx", "zxy", "xzy", "yxz", "zyx"]:
            e = rng.uniform(-1.0, 1.0, size=(16, 3))
            q = np.asarray(quat.euler_to_quat(e, order=order))
            e2 = np.asarray(quat.qeuler(q, order=order))
            np.testing.assert_allclose(e, e2, atol=1e-5)

    def test_qconj_inverse(self, rng):
        q = random_unit_quats(rng, 8)
        ident = np.asarray(quat.qmul(q, quat.qconj(q)))
        want = np.tile(np.array([1.0, 0, 0, 0]), (8, 1))
        np.testing.assert_allclose(ident, want, atol=1e-6)

    def test_qfix_continuity(self, rng):
        q = random_unit_quats(rng, 10).reshape(10, 1, 4)
        q[::2] *= -1
        fixed = np.asarray(quat.qfix(q))
        dots = np.sum(fixed[1:] * fixed[:-1], axis=-1)
        assert (dots >= 0).all()

    def test_expmap(self, rng):
        e = rng.normal(size=(16, 3)) * 0.5
        got = np.asarray(quat.expmap_to_quat(e))
        want = to_scipy_inv(Rotation.from_rotvec(e).as_quat())
        assert quat_allclose(got, want, atol=1e-6)

    def test_switch_pose_w(self):
        pose = np.array([1.0, 2.0, 3.0, 0.1, 0.2, 0.3, 0.9])  # xyzw
        got = np.asarray(quat.switch_pose_w(pose))
        np.testing.assert_allclose(got, [1, 2, 3, 0.9, 0.1, 0.2, 0.3])


def to_scipy_inv(q_xyzw):
    return np.concatenate([q_xyzw[..., 3:], q_xyzw[..., :3]], axis=-1)


def quat_allclose(a, b, atol):
    """Sign-invariant quaternion comparison."""
    d = np.minimum(
        np.linalg.norm(a - b, axis=-1), np.linalg.norm(a + b, axis=-1)
    )
    return (d < atol).all()


class TestTransform:
    def test_quat_to_matrix_matches_scipy(self, rng):
        q = random_unit_quats(rng, 64)
        got = np.asarray(tf.quat_to_matrix(q))
        want = Rotation.from_quat(to_scipy(q)).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_matrix_to_quat_roundtrip(self, rng):
        q = random_unit_quats(rng, 256)
        m = np.asarray(tf.quat_to_matrix(q))
        q2 = np.asarray(tf.matrix_to_quat(m))
        assert quat_allclose(q, q2, atol=1e-5)

    def test_matrix_to_quat_edge_cases(self):
        # identity, 180-degree rotations about each axis
        mats = [np.eye(3)]
        for axis in np.eye(3):
            mats.append(Rotation.from_rotvec(np.pi * axis).as_matrix())
        for m in mats:
            q = np.asarray(tf.matrix_to_quat(m))
            m2 = np.asarray(tf.quat_to_matrix(q))
            np.testing.assert_allclose(m, m2, atol=1e-6)

    def test_pose_matrix_roundtrip(self, rng):
        q = random_unit_quats(rng, 16)
        t = rng.normal(size=(16, 3))
        pose = np.concatenate([t, q], axis=-1)
        mat = np.asarray(tf.pose_to_matrix(pose))
        pose2 = np.asarray(tf.matrix_to_pose(mat))
        np.testing.assert_allclose(pose[:, :3], pose2[:, :3], atol=1e-6)
        assert quat_allclose(pose[:, 3:], pose2[:, 3:], atol=1e-5)

    def test_pose_inverse(self, rng):
        q = random_unit_quats(rng, 8)
        t = rng.normal(size=(8, 3))
        pose = np.concatenate([t, q], axis=-1)
        inv = np.asarray(tf.pose_inverse(pose))
        ident = np.asarray(tf.transform_pose2pose(pose, inv))
        np.testing.assert_allclose(ident[:, :3], 0, atol=1e-5)
        assert quat_allclose(ident[:, 3:], np.tile([1.0, 0, 0, 0], (8, 1)), atol=1e-5)

    def test_base2cam_pose(self, rng):
        # base2cam = ee2cam ∘ inv(ee2base): applying it to the robot base
        # origin must land on the base position as seen from the camera.
        q = random_unit_quats(rng, 2)
        ee2cam = np.concatenate([rng.normal(size=3), q[0]])
        ee2base = np.concatenate([rng.normal(size=3), q[1]])
        b2c = np.asarray(tf.base2cam_pose(ee2cam, ee2base))
        m = np.asarray(tf.pose_to_matrix(ee2cam)) @ np.linalg.inv(
            np.asarray(tf.pose_to_matrix(ee2base))
        )
        np.testing.assert_allclose(b2c[:3], m[:3, 3], atol=1e-5)

    def test_transform_points_inverse(self, rng):
        q = random_unit_quats(rng, 1)[0]
        pose = np.concatenate([rng.normal(size=3), q])
        pts = rng.normal(size=(100, 3))
        fwd = np.asarray(tf.transform_points(pose, pts))
        back = np.asarray(tf.inverse_transform_points(pose, fwd))
        np.testing.assert_allclose(back, pts, atol=1e-5)

    def test_dists_to_line(self, rng):
        p = rng.normal(size=(50, 3))
        lp1 = np.array([0.0, 0, 0])
        lp2 = np.array([1.0, 0, 0])
        got = np.asarray(tf.dists_to_line(p, lp1, lp2))
        want = np.linalg.norm(p[:, 1:], axis=-1)  # distance to x-axis
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestKabsch:
    def test_exact_recovery(self, rng):
        r_true = Rotation.random(random_state=42).as_matrix()
        t_true = rng.normal(size=3)
        src = rng.normal(size=(100, 3))
        dst = src @ r_true.T + t_true
        r, t = kb.kabsch(src, dst)
        np.testing.assert_allclose(np.asarray(r), r_true, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-5)

    def test_no_reflection(self, rng):
        # planar degenerate points can induce det<0 without the fix
        src = rng.normal(size=(10, 3))
        src[:, 2] = 0
        dst = -src
        r, _ = kb.kabsch(src, dst)
        assert np.linalg.det(np.asarray(r)) > 0.99

    def test_masked_matches_exact(self, rng):
        r_true = Rotation.random(random_state=7).as_matrix()
        t_true = rng.normal(size=3)
        src = rng.normal(size=(64, 3))
        dst = src @ r_true.T + t_true
        # pad with garbage rows, mask them out
        src_p = np.concatenate([src, rng.normal(size=(16, 3)) * 100])
        dst_p = np.concatenate([dst, rng.normal(size=(16, 3)) * 100])
        w = np.concatenate([np.ones(64), np.zeros(16)])
        r, t = kb.kabsch(src_p, dst_p, weights=w)
        np.testing.assert_allclose(np.asarray(r), r_true, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-5)

    def test_batched(self, rng):
        src = rng.normal(size=(4, 32, 3))
        rs = Rotation.random(4, random_state=3).as_matrix()
        ts = rng.normal(size=(4, 3))
        dst = np.einsum("bij,bnj->bni", rs, src) + ts[:, None]
        r, t = kb.kabsch(src, dst)
        np.testing.assert_allclose(np.asarray(r), rs, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), ts, atol=1e-5)

    def test_kabsch_pose(self, rng):
        r_true = Rotation.random(random_state=9)
        src = rng.normal(size=(20, 3))
        dst = r_true.apply(src) + np.array([1.0, 2.0, 3.0])
        pose = np.asarray(kb.kabsch_pose(src, dst))
        np.testing.assert_allclose(pose[:3], [1, 2, 3], atol=1e-5)
        want_q = to_scipy_inv(r_true.as_quat())
        assert quat_allclose(pose[3:], want_q, atol=1e-5)


class TestMetrics:
    def test_pose_dist(self, rng):
        gt_q = random_unit_quats(rng, 8)
        pr_q = random_unit_quats(rng, 8)
        gt = np.concatenate([rng.normal(size=(8, 3)), gt_q], axis=-1)
        pr = np.concatenate([rng.normal(size=(8, 3)), pr_q], axis=-1)
        dist, dpos, dori, ang = met.compute_pose_dist(gt, pr)
        np.testing.assert_allclose(
            np.asarray(dpos), np.linalg.norm(gt[:, :3] - pr[:, :3], axis=-1), atol=1e-5
        )
        # angle must equal scipy's relative-rotation magnitude
        want_ang = (
            Rotation.from_quat(to_scipy(gt_q)) * Rotation.from_quat(to_scipy(pr_q)).inv()
        ).magnitude()
        np.testing.assert_allclose(np.asarray(ang), want_ang, atol=1e-4)

    def test_pose_dist_does_not_mutate(self, rng):
        gt = jnp.asarray(np.concatenate([np.ones((2, 3)), random_unit_quats(rng, 2)], -1))
        before = np.asarray(gt).copy()
        met.compute_pose_dist(gt, gt, position_voxelization=100.0)
        np.testing.assert_array_equal(np.asarray(gt), before)

    def test_angle_forms_agree(self, rng):
        # acos(2<q1,q2>^2-1) == atan2 form, as the reference asserts
        q1 = random_unit_quats(rng, 16)
        q2 = random_unit_quats(rng, 16)
        gt = np.concatenate([np.zeros((16, 3)), q1], -1)
        pr = np.concatenate([np.zeros((16, 3)), q2], -1)
        _, _, _, ang = met.compute_pose_dist(gt, pr)
        for i in range(16):
            m = met.compute_pose_metrics(gt[i], pr[i])
            np.testing.assert_allclose(float(m["angle_diff"]), float(ang[i]), atol=1e-4)

    def test_segmentation_metrics(self, rng):
        gt = rng.integers(0, 3, size=500)
        pred = gt.copy()
        flip = rng.random(500) < 0.1
        pred[flip] = rng.integers(0, 3, size=flip.sum())
        res = met.compute_segmentation_metrics(gt, pred)
        # oracle: manual confusion counts
        for ci, cn in enumerate(["background", "arm", "ee"]):
            tp = np.sum((gt == ci) & (pred == ci))
            fp = np.sum((gt != ci) & (pred == ci))
            fn = np.sum((gt == ci) & (pred != ci))
            want_p = 1.0 if fp == 0 else tp / (tp + fp)
            want_r = 1.0 if fn == 0 else tp / (tp + fn)
            np.testing.assert_allclose(
                float(res["class_results"][cn]["precision"]), want_p, atol=1e-6
            )
            np.testing.assert_allclose(
                float(res["class_results"][cn]["recall"]), want_r, atol=1e-6
            )
        assert 0.5 < float(res["accuracy"]) <= 1.0

    def test_add_zero_for_same_pose(self, rng):
        pts = rng.normal(size=(64, 3))
        pose = np.concatenate([[1.0, 2, 3], random_unit_quats(rng, 1)[0]])
        assert float(met.compute_add(pts, pose, pose)) < 1e-6

    def test_rot_trans_diff(self, rng):
        q = random_unit_quats(rng, 1)[0]
        assert float(met.rotational_diff(q, q)) < 1e-3
        np.testing.assert_allclose(
            float(met.translational_diff(np.zeros(3), np.ones(3))),
            np.sqrt(3) * 100,
            rtol=1e-6,
        )


class TestCalibration:
    def test_quat_average_recovers_mean(self, rng):
        # small perturbations around a base rotation
        base = Rotation.random(random_state=5)
        perturbs = Rotation.from_rotvec(rng.normal(size=(50, 3)) * 0.02)
        quats = to_scipy_inv((base * perturbs).as_quat())
        avg = np.asarray(calib.average_quaternions(quats))
        want = to_scipy_inv(base.as_quat())
        assert quat_allclose(avg, want, atol=0.02)

    def test_quat_average_sign_invariance(self, rng):
        q = random_unit_quats(rng, 10)
        base = q[0]
        quats = np.tile(base, (10, 1))
        quats[::2] *= -1  # flipped signs, same rotation
        avg = np.asarray(calib.average_quaternions(quats))
        assert quat_allclose(avg, base, atol=1e-5)

    def test_average_poses(self, rng):
        base_q = random_unit_quats(rng, 1)[0]
        poses = np.tile(np.concatenate([[1.0, 2, 3], base_q]), (5, 1))
        poses[:, :3] += rng.normal(size=(5, 3)) * 0.01
        avg = np.asarray(calib.average_poses(poses))
        np.testing.assert_allclose(avg[:3], poses[:, :3].mean(0), atol=1e-6)
        assert quat_allclose(avg[3:], base_q, atol=1e-4)

    def test_single_pose_identity(self):
        pose = np.array([1.0, 2, 3, 1, 0, 0, 0])
        np.testing.assert_allclose(np.asarray(calib.average_poses(pose[None])), pose)

    def test_mad_outliers(self):
        y = np.array([1.0, 1.02, 0.99, 1.01, 12.0])
        out = np.asarray(calib.mad_outliers(y))
        assert out[-1] and not out[:-1].any()

    def test_remove_pose_outliers_is_noop(self, rng):
        poses = np.concatenate(
            [rng.normal(size=(6, 3)), random_unit_quats(rng, 6)], axis=-1
        )
        got = np.asarray(calib.remove_pose_outliers(poses))
        np.testing.assert_array_equal(got, poses)


class TestPreprocess:
    def test_center_at_origin(self, rng):
        pts = rng.normal(size=(100, 3)) + 5.0
        centered, off = prep.center_at_origin(pts)
        c = np.asarray(centered)
        np.testing.assert_allclose((c.max(0) + c.min(0)) / 2, 0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(off), (pts.max(0) + pts.min(0)) / 2)

    def test_center_at_origin_masked(self, rng):
        pts = rng.normal(size=(100, 3))
        pts_p = np.concatenate([pts, np.full((20, 3), 1e6)])
        mask = np.concatenate([np.ones(100, bool), np.zeros(20, bool)])
        _, off_m = prep.center_at_origin(pts_p, mask=mask)
        _, off = prep.center_at_origin(pts)
        np.testing.assert_allclose(np.asarray(off_m), np.asarray(off), atol=1e-5)

    def test_normalize_colors_0_255(self):
        rgb = np.array([[0.0, 128.0, 255.0]])
        got = np.asarray(prep.normalize_colors(rgb))
        np.testing.assert_allclose(got, [[-0.5, 128 / 255 - 0.5, 0.5]], atol=1e-6)

    def test_normalize_colors_unit(self):
        rgb = np.array([[0.2, 0.5, 0.8]])
        got = np.asarray(prep.normalize_colors(rgb))
        np.testing.assert_allclose(got, [[-0.3, 0.0, 0.3]], atol=1e-6)

    def test_normalize_points_unit_sphere(self, rng):
        pts = rng.normal(size=(64, 3)) * 7 + 3
        got = np.asarray(prep.normalize_points(pts))
        assert abs(np.linalg.norm(got, axis=-1).max() - 1.0) < 1e-5
        np.testing.assert_allclose(got.mean(0), 0, atol=1e-5)
