"""Marker-based calibration baseline.

Parity: /root/reference/app/aruco_calibration.py ``ArucoTestApp`` — estimate
the EE pose per frame from an ArUco tag (optionally ICP-refined) and run it
through the same calibration path as the learned pipeline, as a classical
cross-check.
"""

from __future__ import annotations

import collections

import numpy as np

from ..geometry import base2cam_pose
from ..utils.aruco import compute_ee_pose
from ..utils.logger import get_logger
from .dto import CalibrationResultDTO, ResultDTO
from .inference_engine import InferenceConfig, InferenceEngine


class ArucoCalibrationApp:
    def __init__(self, data_source, engine: InferenceEngine = None,
                 icp_enabled: bool = True, camera_matrix=None):
        # calibration_only engine: no neural nets loaded (aruco_calibration.py:24)
        self.engine = engine or InferenceEngine(InferenceConfig(),
                                                calibration_only=True)
        self.data_source = data_source
        self.icp_enabled = icp_enabled
        self.camera_matrix = camera_matrix
        self.log = get_logger()

    def predict(self, data) -> ResultDTO:
        kw = {}
        if self.camera_matrix is not None:
            kw["camera_matrix"] = self.camera_matrix
        pose = compute_ee_pose(np.asarray(data.points),
                               np.asarray(data.rgb), **kw)
        result = ResultDTO(segmentation=None)
        if pose is None:
            return result
        if self.icp_enabled:
            import jax.numpy as jnp

            from ..data.labels import get_ee_idx
            from ..solve import icp_refine

            ee_idx = get_ee_idx(np.asarray(data.points), pose)
            if len(ee_idx) > 64:
                ee = np.asarray(data.points)[ee_idx]
                pose = np.asarray(icp_refine(
                    self.engine.template, jnp.asarray(ee),
                    jnp.ones(len(ee), bool), jnp.asarray(pose),
                    iterations=self.engine.cfg.icp_iterations))
        result.ee_pose = pose
        result.is_confident = True
        if data.ee2base_pose is not None:
            result.base_pose = np.asarray(
                base2cam_pose(pose, data.ee2base_pose))
            result.key_points_base_pose = result.base_pose.copy()
        return result

    def run(self, n_frames=50) -> CalibrationResultDTO:
        collected = collections.defaultdict(list)
        found = 0
        for _ in range(n_frames):
            data = self.data_source.get()
            if data is None:
                break
            result = self.predict(data)
            if result.ee_pose is not None:
                collected[data.id or "p1"].append(result)
                found += 1
        self.log.info(f"aruco: {found} tagged frames")
        return self.engine.calibrate(dict(collected))
