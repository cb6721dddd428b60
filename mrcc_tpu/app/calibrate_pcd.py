"""Calibrate from a directory of recorded frames.

Parity: /root/reference/app/calibrate_pcd.py — iterate stored frames
(``.pcd`` + ``.npy`` pose sidecars in the reference; here ``.pickle``
samples or ``.npy`` point/rgb pairs since Open3D is unavailable), predict in
chunks, calibrate.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from ..utils.logger import get_logger
from .data_engine import DataEngineInterface, _xyzw_to_wxyz
from .dto import PointCloudDTO
from .inference_engine import InferenceConfig, InferenceEngine
from .main import MainApp


class DirectoryDataEngine(DataEngineInterface):
    """Frames from a directory: ``*.pcd`` (+ ``*_pose.npy`` ee2base XYZW
    sidecars — the reference PCDDataEngine layout, data_engine.py:161-204),
    ``*.pickle`` samples, or ``*_points.npy`` + ``*_rgb.npy`` pairs."""

    def __init__(self, directory: str):
        self.items = sorted(glob.glob(os.path.join(directory, "*.pickle")))
        self.npy_items = sorted(glob.glob(os.path.join(directory,
                                                       "*_points.npy")))
        self.pcd_items = sorted(glob.glob(os.path.join(directory, "*.pcd")))
        self._i = 0

    def _get_pcd(self, j):
        from ..data.rgbd import read_pcd

        path = self.pcd_items[j]
        points, rgb = read_pcd(path)
        pose = None
        sidecar = os.path.splitext(path)[0] + "_pose.npy"
        if os.path.isfile(sidecar):
            pose = _xyzw_to_wxyz(np.load(sidecar))
        self._i += 1
        return PointCloudDTO(points=points, rgb=rgb, ee2base_pose=pose,
                             id=f"f{self._i}")

    def get(self):
        if self._i < len(self.pcd_items):
            return self._get_pcd(self._i)
        if self._i - len(self.pcd_items) < len(self.items):
            from ..data.dataset import load_sample

            s = load_sample(self.items[self._i - len(self.pcd_items)])
            self._i += 1
            return PointCloudDTO(
                points=np.asarray(s["points"], np.float32),
                rgb=np.asarray(s["rgb"], np.float32),
                ee2base_pose=s.get("ee2base_pose"),
                id=f"f{self._i}")
        j = self._i - len(self.pcd_items) - len(self.items)
        if j < len(self.npy_items):
            base = self.npy_items[j][: -len("_points.npy")]
            points = np.load(base + "_points.npy")
            rgb = np.load(base + "_rgb.npy")
            pose = None
            if os.path.isfile(base + "_pose.npy"):
                pose = _xyzw_to_wxyz(np.load(base + "_pose.npy"))
            self._i += 1
            return PointCloudDTO(points=points.astype(np.float32),
                                 rgb=rgb.astype(np.float32),
                                 ee2base_pose=pose, id=f"f{self._i}")
        return None


def calibrate_directory(directory: str, engine: InferenceEngine = None,
                        chunk: int = 20):
    """Chunked predict + calibrate (calibrate_pcd.py:63-84)."""
    log = get_logger()
    engine = engine or InferenceEngine(InferenceConfig())
    source = DirectoryDataEngine(directory)
    app = MainApp(source, engine=engine, num_of_frames=chunk,
                  min_num_of_positions=1)
    n = 0
    while True:
        got = app.collect_position(position_id=f"chunk{n}")
        if got == 0:
            break
        n += 1
    calib = app.calibrate()
    log.info(f"calibrated from {n} chunks")
    return calib
