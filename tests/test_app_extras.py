"""MainApp loop, directory calibration, visualization, ros utils, aruco."""

import numpy as np
import pytest

from mrcc_tpu.app import (
    DirectoryDataEngine,
    InferenceConfig,
    InferenceEngine,
    MainApp,
    SyntheticDataEngine,
)

# slow tier: engine builds (compile-dominated on CPU) — run with --full or scripts/test_on_tpu.py
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def engine():
    cfg = InferenceConfig(
        point_capacity=4096, seg_voxel_capacity=2048, ee_point_capacity=1024,
        ee_voxel_capacity=1024, kp_voxel_capacity=1024,
        seg_backbone="minkunet14A", rot_backbone="minkunet14A",
        kp_backbone="minkunet14A", icp_iterations=5, icp_template_points=256,
        ee_point_counts_threshold=32, sanity_min_num_of_ee_points=64)
    return InferenceEngine(cfg, seed=0)


class TestMainApp:
    def test_headless_session(self, engine):
        source = SyntheticDataEngine(seed=70, n_ee=400, n_arm=500, n_bg=800)
        app = MainApp(source, engine=engine, num_of_frames=2,
                      min_num_of_positions=2)
        calib = app.run(n_positions=2)
        # untrained nets rarely give confident results; the contract is that
        # the session runs end-to-end and returns a CalibrationResultDTO
        assert hasattr(calib, "pose_camera_link")
        assert sum(len(v) for v in app.collected.values()) == 4

    def test_step(self, engine):
        source = SyntheticDataEngine(seed=71, n_ee=400, n_arm=500, n_bg=800)
        app = MainApp(source, engine=engine)
        result = app.step()
        assert result is not None
        assert result.segmentation is not None


class TestDirectoryEngine:
    def test_pickle_directory(self, tmp_path, engine):
        from mrcc_tpu.data.synthetic import write_sample_set

        write_sample_set(tmp_path, n=2, n_ee=300, n_arm=300, n_bg=400)
        eng = DirectoryDataEngine(str(tmp_path / "labeled"))
        d1 = eng.get()
        d2 = eng.get()
        d3 = eng.get()
        assert d1 is not None and d2 is not None and d3 is None
        assert d1.points.shape[1] == 3

    def test_npy_directory(self, tmp_path, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        rgb = rng.random((100, 3)).astype(np.float32)
        np.save(tmp_path / "a_points.npy", pts)
        np.save(tmp_path / "a_rgb.npy", rgb)
        eng = DirectoryDataEngine(str(tmp_path))
        d = eng.get()
        np.testing.assert_allclose(d.points, pts)


class TestVisualization:
    def test_snapshot(self, tmp_path):
        from mrcc_tpu.app.dto import PointCloudDTO, ResultDTO
        from mrcc_tpu.utils.visualization import save_scene_snapshot

        rng = np.random.default_rng(0)
        pts = rng.normal(size=(500, 3)).astype(np.float32)
        data = PointCloudDTO(points=pts, rgb=rng.random((500, 3)))
        result = ResultDTO(segmentation=rng.integers(0, 3, 500),
                           ee_pose=np.array([0, 0, 1, 1, 0, 0, 0.0]),
                           key_points=[(0, np.zeros(3))])
        path = save_scene_snapshot(data, result, str(tmp_path / "s.png"))
        import os

        assert os.path.getsize(path) > 1000


class TestRosUtils:
    def test_pointcloud2_roundtrip(self, rng):
        from types import SimpleNamespace

        from mrcc_tpu.utils.ros_utils import (
            arrays_to_pointcloud2_data,
            pointcloud2_to_arrays,
        )

        pts = rng.normal(size=(50, 3)).astype(np.float32)
        rgb = rng.random((50, 3)).astype(np.float32)
        data, step, fields = arrays_to_pointcloud2_data(pts, rgb)
        msg = SimpleNamespace(
            data=data, point_step=step, width=50, height=1,
            fields=[SimpleNamespace(name=n, offset=o, datatype=d)
                    for n, o, d in fields])
        p2, r2 = pointcloud2_to_arrays(msg)
        np.testing.assert_allclose(p2, pts, atol=1e-6)
        np.testing.assert_allclose(r2, rgb, atol=1 / 255 + 1e-6)


class TestAruco:
    def test_projection(self, rng):
        from mrcc_tpu.utils.aruco import CAMERA_MATRIX_DEFAULT, project_to_rgbd

        pts = np.array([[0.0, 0.0, 1.0], [0.1, 0.1, 2.0]], np.float32)
        rgb = np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32)
        img, depth = project_to_rgbd(pts, rgb, CAMERA_MATRIX_DEFAULT)
        cy, cx = 263, 323
        assert depth[cy, cx] == 1.0
        np.testing.assert_allclose(img[cy, cx], [1, 0, 0])

    def test_aruco_detection_roundtrip(self):
        # render a real ArUco tag as a textured plane in 3D, recover its pose
        cv2 = pytest.importorskip("cv2")
        from mrcc_tpu.utils.aruco import compute_ee_pose

        tag_px = 200
        dic = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_6X6_1000)
        if hasattr(cv2.aruco, "generateImageMarker"):
            marker = cv2.aruco.generateImageMarker(dic, 7, tag_px)
        else:
            marker = cv2.aruco.drawMarker(dic, 7, tag_px)
        size = 0.075
        # plane at z=1, tag spanning [±size/2]² in x-y, facing the camera
        ys, xs = np.mgrid[0:tag_px, 0:tag_px]
        u = (xs / (tag_px - 1) - 0.5) * size * 1.6
        v = (ys / (tag_px - 1) - 0.5) * size * 1.6
        # embed the marker with a white border (quiet zone)
        pad = int(tag_px * 0.3)
        img = np.full((tag_px + 2 * pad, tag_px + 2 * pad), 255, np.uint8)
        img[pad:-pad, pad:-pad] = marker
        h = img.shape[0]
        ys, xs = np.mgrid[0:h, 0:h]
        span = size * (h / tag_px)
        u = (xs / (h - 1) - 0.5) * span
        v = (ys / (h - 1) - 0.5) * span
        pts = np.stack([u.ravel(), v.ravel(), np.ones(h * h)], 1).astype(
            np.float32)
        g = (img.ravel() / 255.0).astype(np.float32)
        rgb = np.stack([g, g, g], 1)
        pose = compute_ee_pose(pts, rgb, t_tag2ee=(0, 0, 0))
        if pose is None:
            pytest.skip("cv2 aruco failed to detect the synthetic tag")
        # tag centre is at (0,0,1)
        np.testing.assert_allclose(pose[:3], [0, 0, 1], atol=0.02)


class TestConfidenceHeads:
    """Confidence-gated is_confident (STRUCTURE.compute_confidence)."""

    def test_confidence_gates_is_confident(self):
        import dataclasses

        import numpy as np

        from mrcc_tpu.app import InferenceConfig, InferenceEngine
        from mrcc_tpu.app import SyntheticDataEngine

        cfg = InferenceConfig(
            point_capacity=2048, seg_voxel_capacity=512,
            ee_point_capacity=256, ee_voxel_capacity=256,
            kp_voxel_capacity=256, seg_backbone="minkunet14A",
            rot_backbone="minkunet14A", kp_backbone="minkunet14A",
            icp_iterations=2, icp_template_points=128,
            ee_point_counts_threshold=16, sanity_min_num_of_ee_points=16,
            compute_confidence=True)
        eng = InferenceEngine(cfg, seed=0)
        data = SyntheticDataEngine(seed=2, n_ee=400, n_arm=500,
                                   n_bg=600).get()
        r = eng.predict(data)
        assert r.confidence is not None and 0.0 <= r.confidence <= 1.0

        # an impossible threshold forces is_confident False
        eng.cfg = dataclasses.replace(cfg, confidence_threshold=1.1)
        r2 = eng.predict(data)
        assert r2.is_confident is False

    def test_rotation_model_has_10_outputs(self):
        import jax.numpy as jnp
        import numpy as np

        from mrcc_tpu.app import InferenceConfig, InferenceEngine

        cfg = InferenceConfig(
            point_capacity=1024, seg_voxel_capacity=256,
            ee_point_capacity=128, ee_voxel_capacity=128,
            kp_voxel_capacity=128, seg_backbone="minkunet14A",
            rot_backbone="minkunet14A", kp_backbone="minkunet14A",
            icp_iterations=2, icp_template_points=128,
            compute_confidence=True)
        eng = InferenceEngine(cfg, seed=0)
        pts = jnp.zeros((1, 128, 3)).at[0, :, 0].set(
            jnp.linspace(0, 0.2, 128))
        valid = jnp.ones((1, 128), bool)
        pose, conf = eng._pose_jit(eng.params["rotation"], pts,
                                   jnp.zeros((1, 128, 3)), valid)
        assert pose.shape == (1, 7) and conf.shape == (1, 3)
        assert (np.asarray(conf) >= 0).all() and (np.asarray(conf) <= 1).all()


class TestFlipDisambiguation:
    """Opt-in gripper-symmetry flip stage (ROADMAP r5 #2)."""

    def _cfg(self):
        from mrcc_tpu.app import InferenceConfig

        return InferenceConfig(
            point_capacity=1024, seg_voxel_capacity=256,
            ee_point_capacity=128, ee_voxel_capacity=128,
            kp_voxel_capacity=128, seg_backbone="minkunet14A",
            rot_backbone="minkunet14A", kp_backbone="minkunet14A",
            icp_iterations=2, icp_template_points=128,
            rot_flip_disambiguation=True)

    def test_flip_stage_jit(self):
        import jax.numpy as jnp
        import numpy as np

        from mrcc_tpu.app import InferenceEngine
        from mrcc_tpu.geometry.quaternion import qmul

        eng = InferenceEngine(self._cfg(), seed=0)
        q_gt = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
        q_wrong = qmul(q_gt, jnp.asarray([0.0, 0, 0, 1]))
        pts = jnp.zeros((1, 128, 3)).at[0, :, 1].set(
            jnp.linspace(0, 0.2, 128))
        valid = jnp.ones((1, 128), bool)
        ee_pose = jnp.concatenate([jnp.zeros(3), q_wrong])[None]
        kp_pose = jnp.concatenate([jnp.zeros(3), q_gt])[None]
        fixed = eng._flip_jit(None, ee_pose, kp_pose,
                              jnp.asarray([True]), pts, valid)
        # flipped onto the kp branch (sign-invariant)
        d = abs(float(jnp.sum(fixed[0, 3:7] * q_gt)))
        assert d > 0.999

    def test_full_pipeline_traces_with_flip(self):
        """The fused (TPU) program includes the flip stage — validate the
        wiring by abstract tracing (no compile)."""
        import jax
        import jax.numpy as jnp

        from mrcc_tpu.app import InferenceEngine

        eng = InferenceEngine(self._cfg(), seed=0)
        bundle = {"params": eng.params, "template": eng.template}
        pts = jnp.zeros((1, 1024, 3))
        rgb = jnp.zeros((1, 1024, 3))
        mask = jnp.ones((1, 1024), bool)
        out = jax.eval_shape(eng._full_pipeline, bundle, pts, rgb, mask)
        assert out["ee_pose"].shape == (1, 7)
