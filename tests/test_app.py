"""InferenceEngine end-to-end on synthetic scenes (small capacities for CPU)."""

import numpy as np
import pytest

from mrcc_tpu.app import (
    InferenceConfig,
    InferenceEngine,
    ResultDTO,
    SyntheticDataEngine,
)
from mrcc_tpu.data.synthetic import gt_base2cam_pose

# slow tier: fused-engine builds (compile-dominated on CPU) — run with --full or scripts/test_on_tpu.py
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def engine():
    cfg = InferenceConfig(
        point_capacity=8192,
        seg_voxel_capacity=4096,
        ee_point_capacity=2048,
        ee_voxel_capacity=2048,
        kp_voxel_capacity=2048,
        seg_backbone="minkunet14A",
        rot_backbone="minkunet14A",
        kp_backbone="minkunet14A",
        icp_iterations=10,
        icp_template_points=512,
        ee_point_counts_threshold=64,
        sanity_min_num_of_ee_points=256,
    )
    return InferenceEngine(cfg, seed=0)


@pytest.fixture(scope="module")
def source():
    return SyntheticDataEngine(seed=7, n_ee=1024, n_arm=1500, n_bg=3000)


class TestPredict:
    def test_predict_returns_result(self, engine, source):
        data = source.get()
        result = engine.predict(data)
        assert isinstance(result, ResultDTO)
        assert result.segmentation is not None
        assert len(result.segmentation) == len(data.points)
        assert set(np.unique(result.segmentation)) <= {0, 1, 2}

    def test_predict_pose_shape_when_ee_found(self, engine, source):
        # untrained nets give garbage labels, but the pipeline contract
        # (shapes, finiteness, gating) must hold
        data = source.get()
        result = engine.predict(data)
        if result.ee_pose is not None:
            assert result.ee_pose.shape == (7,)
            assert np.isfinite(result.ee_pose).all()
            if data.ee2base_pose is not None:
                assert result.base_pose is not None
        for cls, coord in result.key_points:
            assert 0 <= cls < 6
            assert coord.shape == (3,)

    def test_calibrate_with_gt_results(self, engine):
        # feed calibrate() hand-built confident results around the true
        # extrinsic: the averaged output must recover it
        rng = np.random.default_rng(0)
        want = gt_base2cam_pose().astype(np.float32)
        want_q = want[3:] / np.linalg.norm(want[3:])
        data = {}
        for pos in ["p1", "p2", "p3"]:
            results = []
            for _ in range(4):
                r = ResultDTO(segmentation=None, is_confident=True)
                r.ee_pose = np.zeros(7, np.float32)
                noise = np.concatenate(
                    [rng.normal(size=3) * 0.003, rng.normal(size=4) * 0.002])
                r.base_pose = np.concatenate([want[:3], want_q]) + noise
                r.key_points_base_pose = r.base_pose.copy()
                results.append(r)
            data[pos] = results
        calib = engine.calibrate(data)
        assert calib.pose_camera_link is not None
        np.testing.assert_allclose(calib.pose_camera_link[:3], want[:3],
                                   atol=0.01)
        d = min(np.linalg.norm(calib.pose_camera_link[3:] - want_q),
                np.linalg.norm(calib.pose_camera_link[3:] + want_q))
        assert d < 0.01

    def test_calibrate_unconfident_returns_none_pose(self, engine):
        r = ResultDTO(segmentation=None, is_confident=False)
        calib = engine.calibrate({"p1": [r, r]})
        assert calib.pose_camera_link is None

    def test_pred_disabled(self):
        eng = InferenceEngine(InferenceConfig(), calibration_only=True)
        data = SyntheticDataEngine(seed=1, n_ee=256, n_arm=256, n_bg=256).get()
        result = eng.predict(data)
        assert (result.segmentation == 0).all()
        assert result.ee_pose is None


class TestOracleSegmentation:
    """Bypass the untrained seg net: feed gt labels through the pose stages
    by building an engine whose predict uses gt segmentation.  This pins the
    geometric solve path (crop -> rotation-independent stages -> ICP)."""

    def test_gt_seg_to_icp_pose(self, engine, source):
        import jax.numpy as jnp

        from mrcc_tpu.geometry.metrics import compute_pose_metrics
        from mrcc_tpu.solve import icp_refine, default_template

        raw = source.get_raw()
        ee_pts = raw.points[raw.labels == 2]
        gt = raw.pose

        # seed ICP with a perturbed gt pose (plays the role of the NN)
        rng = np.random.default_rng(3)
        init = gt.copy()
        init[:3] += rng.normal(size=3) * 0.01
        refined = np.asarray(icp_refine(
            jnp.asarray(default_template(512)),
            jnp.asarray(ee_pts), jnp.ones(len(ee_pts), bool),
            jnp.asarray(init), iterations=15))
        m = compute_pose_metrics(gt, refined)
        assert float(m["dist_position"]) < 0.02
        assert float(m["angle_diff"]) < 0.2


class TestDenseKeypointPath:
    """The pointnet2 (dense) keypoint route of the engine
    (reference predict_key_points :512-537)."""

    @pytest.fixture(scope="class", params=["uniform", "farthest"])
    def dense_engine(self, request):
        cfg = InferenceConfig(
            point_capacity=4096,
            seg_voxel_capacity=2048,
            ee_point_capacity=1024,
            ee_voxel_capacity=1024,
            kp_voxel_capacity=512,
            seg_backbone="minkunet14A",
            rot_backbone="minkunet14A",
            kp_backbone="pointnet2",
            kp_sampling_method=request.param,
            num_of_dense_input_points=128,
            icp_iterations=5,
            icp_template_points=256,
            ee_point_counts_threshold=64,
            sanity_min_num_of_ee_points=128,
        )
        return InferenceEngine(cfg, seed=0)

    def test_dense_predict_shapes(self, dense_engine):
        data = SyntheticDataEngine(seed=3, n_ee=700, n_arm=900,
                                   n_bg=1200).get()
        result = dense_engine.predict(data)
        assert len(result.segmentation) == len(data.points)
        # keypoint coords (if any) must be actual scene points
        for cls, coord in result.key_points:
            assert 0 <= cls < 6
            assert np.isfinite(coord).all()

    def test_dense_kp_found_requires_enough_points(self, dense_engine):
        import jax.numpy as jnp

        # EE crop with fewer valid points than num_of_dense_input_points
        pts = np.random.default_rng(0).normal(
            size=(1, 1024, 3)).astype(np.float32) * 0.05
        rgb = np.zeros((1, 1024, 3), np.float32)
        valid = np.zeros((1, 1024), bool)
        valid[0, :64] = True  # < 128 dense input points
        _, _, _, kp_found, _ = dense_engine._kp_jit(
            dense_engine.params["key_points"], jnp.asarray(pts),
            jnp.asarray(rgb), jnp.asarray(valid))
        assert not np.asarray(kp_found).any()
