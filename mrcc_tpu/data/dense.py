"""Dense fixed-size dataset variant for the PointNet2 keypoint path.

Parity: /root/reference/data/alivev2_dense.py ``AliveV2DenseDataset``:
requires >= num_of_dense_input_points (2048) EE points, samples exactly that
many (uniform or FPS, memoized), keypoint labels per point, features =
normalized coords or rgb; collate stacks [B, N, ...].
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..geometry.quaternion import EPS  # noqa: F401
from .dataset import AliveV2Dataset, DataConfig
from .labels import farthest_point_sample_idx


class AliveV2DenseDataset(AliveV2Dataset):
    def __init__(self, *args, num_points=2048, sampling="uniform",
                 use_coords_as_features=True, **kw):
        super().__init__(*args, **kw)
        self.num_points = num_points
        self.sampling = sampling
        self.use_coords_as_features = use_coords_as_features
        self._sample_memo = {}

    def __getitem__(self, i):
        item = super().__getitem__(i)
        if item is None:
            return None
        pts = item["points"]
        if len(pts) < self.num_points:
            return None  # alivev2_dense requires >= num_points
        if i not in self._sample_memo:
            if self.sampling == "farthest":
                idx = farthest_point_sample_idx(pts, self.num_points, seed=i)
            else:
                idx = np.random.default_rng(i).choice(
                    len(pts), self.num_points, replace=False)
            self._sample_memo[i] = idx
        idx = self._sample_memo[i]
        pts = pts[idx]
        if self.use_coords_as_features:
            feats = pts / np.maximum(np.linalg.norm(pts, axis=-1).max(), 1e-12)
        else:
            feats = item["feats"][idx]
        return {
            "points": pts.astype(np.float32),
            "feats": feats.astype(np.float32),
            "labels": item["labels"][idx],
            "pose": item["pose"],
            "other": item["other"],
        }

    def collate(self, items):
        items = [it for it in items if it is not None]
        b = len(items)
        n = self.num_points
        c = items[0]["feats"].shape[-1]
        out = {
            "points": np.zeros((b, n, 3), np.float32),
            "feats": np.zeros((b, n, c), np.float32),
            "labels": np.zeros((b, n), np.int32),
            "mask": np.ones((b, n), bool),
            "pose": np.zeros((b, 7), np.float32),
            "joint_angles": np.zeros((b, 9), np.float32),
            "others": [],
        }
        for k, it in enumerate(items):
            out["points"][k] = it["points"]
            out["feats"][k] = it["feats"]
            out["labels"][k] = it["labels"]
            out["pose"][k] = it["pose"][:7]
            ja = it["other"].get("joint_angles")
            if ja is not None:
                out["joint_angles"][k] = ja
            out["others"].append(it["other"])
        return out
