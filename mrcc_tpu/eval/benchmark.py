"""Offline end-to-end benchmark — app/test.py ``TestApp`` equivalent.

Parity: /root/reference/app/test.py:73-290: for every labelled sample,
run the full InferenceEngine, compute segmentation metrics, NN pose and
KP pose errors (with ICP already applied inside the engine), ADD, and
base2cam errors vs the ground-truth extrinsic; apply the sanity filter;
per-position calibration; write the summary workbook
(:331-509, here via eval.report).
"""

from __future__ import annotations

import re
from collections import defaultdict
from typing import Optional

import numpy as np

from ..app.dto import RawDTO, TestResultDTO
from ..geometry import base2cam_pose
from ..geometry.metrics import (
    compute_add,
    compute_pose_metrics,
    compute_segmentation_metrics,
)
from ..solve.icp import default_template


class BenchmarkApp:
    """Offline benchmark over a data engine's labelled stream."""

    def __init__(self, engine, data_engine, gt_base_to_cam_pose,
                 n_samples=20, ignore_unconfident=True):
        self.engine = engine
        self.data_engine = data_engine
        self.gt_b2c = np.asarray(gt_base_to_cam_pose, np.float32)
        self.n_samples = n_samples
        self.ignore_unconfident = ignore_unconfident
        self.add_points = default_template(512)

    @staticmethod
    def _position_of(raw) -> str:
        """Grouping key for per-position sections (app/test.py:227-236).

        Prefer an explicit position field from the sample metadata; else a
        ``pN`` prefix of the frame id (ids like ``p2_f13``); else one group
        — per-frame ids must not each become their own 'position' block."""
        other = getattr(raw, "other", None) or {}
        if isinstance(other, dict) and other.get("position"):
            return str(other["position"])
        rid = str(raw.id or "")
        m = re.match(r"^(p\d+)", rid)
        if m:
            return m.group(1)
        return "all"

    def run(self, out_path: Optional[str] = None):
        metrics = defaultdict(list)
        position_metrics = defaultdict(lambda: defaultdict(list))
        predictions = defaultdict(list)

        for _ in range(self.n_samples):
            raw: RawDTO = self.data_engine.get_raw()
            if raw is None:
                break
            result = self.engine.predict(raw)
            position = self._position_of(raw)

            def record(name, value):
                metrics[name].append(value)
                position_metrics[position][name].append(value)

            if raw.labels is not None and result.segmentation is not None:
                seg = compute_segmentation_metrics(
                    raw.labels.astype(np.int32), result.segmentation)
                record("seg_accuracy", float(seg["accuracy"]))
                record("seg_precision", float(seg["precision"]))
                record("seg_recall", float(seg["recall"]))
                # per-class columns (reference app/test.py:405-441:
                # Segmentation P/R/A per class)
                for cls, cr in seg["class_results"].items():
                    record(f"seg_{cls}_precision", float(cr["precision"]))
                    record(f"seg_{cls}_recall", float(cr["recall"]))

            if result.ee_pose is not None and raw.pose is not None:
                m = compute_pose_metrics(raw.pose, result.ee_pose)
                record("nn_translation_m", float(m["dist_position"]))
                record("nn_rotation_rad", float(m["angle_diff"]))
                record("nn_add_m", float(compute_add(
                    self.add_points, raw.pose, result.ee_pose)))

            if result.key_points_pose is not None and raw.pose is not None:
                m = compute_pose_metrics(raw.pose, result.key_points_pose)
                record("kp_translation_m", float(m["dist_position"]))
                record("kp_rotation_rad", float(m["angle_diff"]))

            if raw.ee2base_pose is not None and result.base_pose is not None:
                m = compute_pose_metrics(self.gt_b2c, result.base_pose)
                record("base2cam_translation_m", float(m["dist_position"]))
                record("base2cam_rotation_rad", float(m["angle_diff"]))

            if result.is_confident or not self.ignore_unconfident:
                t = TestResultDTO(segmentation=None,
                                  is_confident=result.is_confident)
                t.ee_pose = result.ee_pose
                t.base_pose = result.base_pose
                t.key_points_pose = result.key_points_pose
                t.key_points_base_pose = result.key_points_base_pose
                predictions[raw.id or "p1"].append(t)

        calibration = self.engine.calibrate(predictions) if predictions else None
        calib_err = None
        if calibration is not None and calibration.pose_camera_link is not None:
            m = compute_pose_metrics(self.gt_b2c,
                                     calibration.pose_camera_link)
            calib_err = {"translation_m": float(m["dist_position"]),
                         "rotation_rad": float(m["angle_diff"])}
            metrics["calib_translation_m"].append(calib_err["translation_m"])
            metrics["calib_rotation_rad"].append(calib_err["rotation_rad"])

        position_metrics = {p: dict(v) for p, v in position_metrics.items()}
        report_path = None
        table = None
        if out_path:
            from .report import write_report

            report_path, table = write_report(
                dict(metrics), out_path, extra={"calibration": calib_err},
                position_metrics=position_metrics)
        return {"metrics": dict(metrics), "calibration": calib_err,
                "positions": position_metrics,
                "report": report_path, "table": table}
