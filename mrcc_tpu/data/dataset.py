"""Dataset pipeline: pickle samples -> padded fixed-shape device batches.

TPU-native counterpart of /root/reference/data/alivev2.py ``AliveV2Dataset``
and its collates: the host side loads/crops/labels/augments in numpy (same
steps as the reference __getitem__, data/alivev2.py:240-301) but emits padded
``[P, ...]`` buffers with a validity mask; voxel quantization runs on-device
inside the jitted step (mrcc_tpu.sparse.voxelize) instead of in CPU workers
(the ME ``sparse_quantize`` call the reference does per item).

Sample schema (README.md:53-62): pickle dict with points/rgb/labels/
instance_labels/pose (XYZW)/joint_angles.  Pose is converted to WXYZ at load
(alivev2.py:124).
"""

from __future__ import annotations

import dataclasses
import json
import pickle
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from ..geometry.quaternion import EPS  # noqa: F401
from . import augmentation as aug
from .labels import (
    collect_closest_points,
    get_6_key_points,
    get_ee_cross_section_idx,
    get_ee_idx,
    get_key_points,
    get_roi_mask,
    quat_to_matrix_np,
)


@dataclasses.dataclass
class DataConfig:
    """Explicit replacement for the reference's DATA config section
    (config/default.yaml:14-65)."""

    scale: float = 100.0            # voxel size = 1/scale
    max_points: int = 65536         # static pad capacity P (<= max_npoint)
    data_type: Optional[str] = "ee_seg"  # None | 'gt_seg' | 'ee_seg'
    ignore_label: int = -100
    classes: int = 3
    ee_segmentation_enabled: bool = True
    center_at_origin: bool = True
    base_at_origin: bool = False
    move_ee_to_origin: bool = False
    voxelize_position: bool = False
    voting_enabled: bool = False
    keypoints_enabled: bool = False
    num_of_keypoints: int = 6
    use_coordinates_as_features: bool = False
    augmentation: Sequence[str] = ()
    augmentation_probability: float = 0.2
    roi: Optional[Dict[str, Dict[str, float]]] = None
    roi_offset: float = 0.13

    @property
    def quantization_size(self) -> float:
        return 1.0 / self.scale


def load_sample(path):
    """Unpickle one sample; tuple-pickles (alivev1) are also accepted."""
    with open(path, "rb") as f:
        x = pickle.load(f)
    if isinstance(x, dict):
        return x
    points, rgb, labels, instance_labels, pose = x[:5]
    return {"points": points, "rgb": rgb, "labels": labels,
            "instance_labels": instance_labels, "pose": pose,
            "joint_angles": None}


def filter_file(entry, prefix="") -> bool:
    """Split-entry eligibility (alivev2.py:306 ``filter_file``)."""
    filepath = entry["filepath"] if isinstance(entry, dict) else entry
    name = filepath.split("/")[-1]
    if name.endswith("_semantic.pickle") or name.endswith("_eemask.pickle"):
        return False
    if "dark" in name:
        return False
    if prefix and not name.startswith(prefix):
        return False
    return True


def merge_split_files(paths, split="train", prefix=""):
    """Merge one or more split JSONs and filter entries
    (train.py:300-313 + filter_file)."""
    entries: List[dict] = []
    for p in str(paths).split(",") if isinstance(paths, str) else paths:
        with open(p) as f:
            data = json.load(f)
        entries.extend(data.get(split, []))
    return [e for e in entries if filter_file(e, prefix=prefix)]


class AliveV2Dataset:
    """Map-style dataset over labelled sample pickles (or in-memory dicts)."""

    def __init__(self, files=None, samples=None, cfg: DataConfig = None,
                 augment: bool = False, seed: int = 0, cache_items=None):
        self.cfg = cfg or DataConfig()
        self.files = list(files) if files is not None else None
        self.samples = samples
        self.augmenting = augment
        self.rng = np.random.default_rng(seed)
        self._kp_memo: Dict[int, tuple] = {}
        self._cs_memo: Dict[int, np.ndarray] = {}
        # eager item caching (the reference's DATA.load_cache_at_start,
        # alivev2.py:93) — lazy here: first epoch fills, later epochs reuse.
        # Only valid without augmentation (augmented items differ per epoch).
        self.cache_items = (not augment) if cache_items is None else cache_items
        self._item_memo: Dict[int, dict] = {}

    def __len__(self):
        return len(self.files) if self.files is not None else len(self.samples)

    def _raw(self, i):
        if self.samples is not None:
            return dict(self.samples[i]), {}
        entry = self.files[i]
        path = entry["filepath"] if isinstance(entry, dict) else entry
        other = dict(entry) if isinstance(entry, dict) else {"filepath": path}
        return load_sample(path), other

    def __getitem__(self, i):
        if self.cache_items and i in self._item_memo:
            return self._item_memo[i]
        item = self._load_item(i)
        if self.cache_items:
            self._item_memo[i] = item
        return item

    def _load_item(self, i):
        cfg = self.cfg
        sample, other = self._raw(i)
        points = np.asarray(sample["points"], np.float32)
        rgb = np.asarray(sample["rgb"], np.float32)
        labels = np.asarray(sample["labels"], np.float32).reshape(-1)
        pose = np.asarray(sample["pose"], np.float32).reshape(-1)
        pose = np.concatenate([pose[:3], pose[6:7], pose[3:6]])  # XYZW -> WXYZ
        joint_angles = sample.get("joint_angles")
        other["filename"] = other.get("filepath", f"sample_{i}")
        other["joint_angles"] = joint_angles
        if "ee2base_pose" in sample:
            other["ee2base_pose"] = np.asarray(sample["ee2base_pose"], np.float32)

        arm_idx = np.where(labels == 1)[0]

        # EE labels: geometric derivation when the pickle has none
        # (alivev2.py:135-154)
        if cfg.ee_segmentation_enabled or cfg.data_type == "ee_seg":
            if (labels == 2).any():
                ee_idx = np.where(labels == 2)[0]
            else:
                ee_idx = get_ee_idx(
                    points, pose,
                    ee_dim={"min_z": -0.0, "max_z": 0.13, "min_x": -0.05,
                            "max_x": 0.05, "min_y": -0.14, "max_y": 0.14},
                    arm_idx=arm_idx)
            labels[ee_idx] = 2

        if cfg.data_type == "gt_seg":
            sel = arm_idx
        elif cfg.data_type == "ee_seg":
            sel = np.where(labels == 2)[0]
            if len(sel) < 1:
                return None
        else:
            sel = slice(None)
        points, rgb, labels = points[sel], rgb[sel], labels[sel]

        if cfg.roi is not None and other.get("position") in cfg.roi:
            m = get_roi_mask(points, offset=cfg.roi_offset,
                             **cfg.roi[other["position"]])
            points, rgb, labels = points[m], rgb[m], labels[m]

        # rgb normalization rescue (alivev2.py:180-188)
        if len(rgb) > 0:
            if rgb.min() < 0:
                mn, mx = rgb.min(0), rgb.max(0)
                rgb = (rgb - mn) / np.maximum(mx - mn, 1e-12)
            if rgb.min() > -1e-6 and rgb.max() < 1 + 1e-6:
                rgb = rgb - 0.5

        if cfg.voxelize_position:
            pose = pose.copy()
            pose[:3] /= cfg.quantization_size

        if cfg.voting_enabled:
            if cfg.keypoints_enabled:
                raise AttributeError(
                    "Voting and keypoint cannot be simultaneously enabled.")
            if i not in self._cs_memo:
                _, cs_idx = get_ee_cross_section_idx(points, pose, count=32,
                                                     cutoff=0.004)
                self._cs_memo[i] = cs_idx
            if cfg.data_type == "ee_seg":
                labels = labels * 0
            labels[self._cs_memo[i]] = 1 if cfg.data_type == "ee_seg" else 3

        if cfg.keypoints_enabled:
            labels = self._keypoint_labels(i, points, pose, labels)

        if self.augmenting and cfg.augmentation:
            points = aug.augment_segmentation(
                points, self.rng, scale=cfg.scale,
                probability=cfg.augmentation_probability,
                **{k: True for k in cfg.augmentation})

        points, pose, other = self._post_point_ops(points, pose, other)

        if cfg.use_coordinates_as_features:
            rgb = points.copy()
            if not cfg.center_at_origin:
                c = (rgb.max(0) + rgb.min(0)) / 2
                rgb = rgb - c
            rgb = rgb / np.maximum(np.abs(rgb).max(0), 1e-12)

        return {
            "points": points.astype(np.float32),
            "feats": rgb.astype(np.float32),
            "labels": labels.astype(np.int32),
            "pose": pose.astype(np.float32),
            "other": other,
        }

    def _keypoint_labels(self, i, points, pose, labels):
        """Per-point keypoint class labels (alivev2.py:212-238)."""
        cfg = self.cfg
        labels = labels * 0 + cfg.ignore_label
        if i not in self._kp_memo:
            gen = get_6_key_points if cfg.num_of_keypoints == 6 else get_key_points
            _, kp_idx = gen(points, pose, ignore_label=cfg.ignore_label)
            if len(kp_idx) == 0:
                self._kp_memo[i] = (np.array([], np.int64), np.array([], np.int64))
            else:
                real = kp_idx > -1
                kp_classes_real = np.arange(len(kp_idx))[real]
                kp_idx_real = kp_idx[real]
                pcls_idx, p_idx = collect_closest_points(kp_idx_real, points)
                self._kp_memo[i] = (kp_classes_real[pcls_idx], p_idx)
        kp_classes, kp_idx = self._kp_memo[i]
        labels[kp_idx] = kp_classes
        return labels

    def _post_point_ops(self, points, pose, other):
        """move_ee_to_origin / center_at_origin / base_at_origin
        (alivev2.py:192-210)."""
        cfg = self.cfg
        pose = pose.copy()
        if cfg.data_type == "ee_seg" and cfg.move_ee_to_origin:
            rot = quat_to_matrix_np(pose[3:7])
            stacked = np.concatenate([points, pose[None, :3]]) @ rot
            pose[:3] = stacked[-1]
            points = stacked[:-1]
        if cfg.center_at_origin:
            offset = (points.max(0) + points.min(0)) / 2
            points = points - offset
            pose[:3] -= offset
            other["origin_offset"] = offset
        elif cfg.base_at_origin:
            offset = points.min(0)
            points = points - offset
            pose[:3] -= offset
            other["origin_base_offset"] = offset
        return points, pose, other

    def collate(self, items):
        """Stack items into padded fixed-shape arrays.

        Replaces the ME-coordinate collates (alivev2.py:358-438): instead of
        ragged concatenation with batch-index columns, every item gets a
        fixed ``max_points`` row block and a mask.
        """
        items = [it for it in items if it is not None]
        p = self.cfg.max_points
        b = len(items)
        c = items[0]["feats"].shape[-1]
        points = np.zeros((b, p, 3), np.float32)
        feats = np.zeros((b, p, c), np.float32)
        labels = np.full((b, p), self.cfg.ignore_label, np.int32)
        mask = np.zeros((b, p), bool)
        poses = np.zeros((b, 7), np.float32)
        joint_angles = np.zeros((b, 9), np.float32)
        others = []
        for k, it in enumerate(items):
            n = min(len(it["points"]), p)
            points[k, :n] = it["points"][:n]
            feats[k, :n] = it["feats"][:n]
            labels[k, :n] = it["labels"][:n]
            mask[k, :n] = True
            poses[k] = it["pose"][:7]
            ja = it["other"].get("joint_angles")
            if ja is not None:
                joint_angles[k] = ja
            others.append(it["other"])
        return {"points": points, "feats": feats, "labels": labels,
                "mask": mask, "pose": poses, "joint_angles": joint_angles,
                "others": others}

    def batches(self, batch_size, shuffle=True, drop_last=False, seed=0):
        """Simple host-side batch iterator (the reference uses torch
        DataLoader workers; here batches are cheap numpy ops)."""
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for s in range(0, len(order), batch_size):
            idx = order[s:s + batch_size]
            if drop_last and len(idx) < batch_size:
                return
            items = [self[int(i)] for i in idx]
            items = [it for it in items if it is not None]
            if items:
                yield self.collate(items)
