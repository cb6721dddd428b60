"""Calibration application driver (headless-first).

Parity: /root/reference/app/main.py ``MainApp`` — an update loop pulling
frames from a data engine through the InferenceEngine, a collection phase
gathering ``num_of_frames`` confident results per robot position, and a
calibration phase once ``min_num_of_positions`` positions are collected,
printing the camera extrinsic.

The reference couples this to an Open3D GUI (app/main.py:81-219); Open3D is
not available in this image, so the default driver is headless (optional
matplotlib snapshots via ``snapshot_dir``) with the same control flow and
thresholds (INFERENCE.CALIBRATION: 10 frames/position, >=5 positions,
config/default.yaml:189-191).
"""

from __future__ import annotations

import collections
import time
import typing

import numpy as np

from ..utils.logger import get_logger
from .dto import CalibrationResultDTO, PointCloudDTO, ResultDTO
from .inference_engine import InferenceConfig, InferenceEngine


class MainApp:
    def __init__(self, data_source, engine: InferenceEngine = None,
                 num_of_frames: int = 10, min_num_of_positions: int = 5,
                 frame_period_s: float = 0.0, snapshot_dir: str = None):
        self.data_source = data_source
        self.engine = engine or InferenceEngine(InferenceConfig())
        self.num_of_frames = num_of_frames
        self.min_num_of_positions = min_num_of_positions
        self.frame_period_s = frame_period_s
        self.snapshot_dir = snapshot_dir
        self.collected: typing.Dict[str, list] = collections.defaultdict(list)
        self.log = get_logger()

    def step(self) -> typing.Optional[ResultDTO]:
        """One update-loop iteration (app/main.py:375 ``_update_thread``)."""
        data = self.data_source.get()
        if data is None:
            return None
        t0 = time.time()
        result = self.engine.predict(data)
        dt = time.time() - t0
        self.log.info(
            f"frame id={data.id} ee_pts="
            f"{int((result.segmentation == 2).sum())} "
            f"confident={result.is_confident} ({dt:.2f}s)")
        if self.snapshot_dir:
            from ..utils.visualization import save_scene_snapshot

            save_scene_snapshot(data, result,
                                f"{self.snapshot_dir}/frame_{data.id}.png")
        if self.frame_period_s and dt < self.frame_period_s:
            time.sleep(self.frame_period_s - dt)
        return result

    def collect_position(self, position_id: str = None) -> int:
        """Collect up to num_of_frames results for the current robot position
        (app/main.py:238 ``_collection_thread``)."""
        count = 0
        for _ in range(self.num_of_frames):
            data = self.data_source.get()
            if data is None:
                break
            result = self.engine.predict(data)
            pid = position_id or data.id or "p1"
            self.collected[pid].append(result)
            count += 1
        self.log.info(f"collected {count} frames for position "
                      f"{position_id or 'auto'}")
        return count

    def calibrate(self) -> CalibrationResultDTO:
        """Run calibration once enough positions are collected
        (app/main.py:276 ``_calibration_thread``)."""
        if len(self.collected) < self.min_num_of_positions:
            self.log.warning(
                f"need >= {self.min_num_of_positions} positions, have "
                f"{len(self.collected)}")
        calibration = self.engine.calibrate(dict(self.collected))
        if calibration.pose_camera_link is not None:
            vals = ", ".join(f"{v:.4f}"
                             for v in calibration.pose_camera_link.tolist())
            print(f"Latest calibration: [{vals}]")
        return calibration

    def run(self, n_positions: int = None) -> CalibrationResultDTO:
        """Full headless session: collect frames for n positions, calibrate."""
        n_positions = n_positions or self.min_num_of_positions
        for i in range(n_positions):
            self.collect_position()
        return self.calibrate()
