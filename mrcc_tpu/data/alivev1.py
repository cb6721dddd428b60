"""AliveV1 dataset: the older tuple-pickle schema with its own file path.

Parity: /root/reference/data/alivev1.py — the v1 pipeline differs from v2
in every stage the reference implements separately:

- file discovery by folder glob ``<folder>/<set_name>/*<suffix>``
  (alivev1.py:91-97) with filename filtering: ``_semantic.pickle``
  sidecars skipped, "dark" captures skipped, optional prefix
  (:79-89);
- tuple pickles ``(points, rgb, labels, instance_labels, pose)`` with an
  optional ``*_semantic.pickle`` prediction sidecar (:99-112);
- pose stored XYZW, converted by *inserting* w at position 3 (:60-61);
- the ``full_scale`` crop clips scaled coordinates to the v1 grid extent
  before quantization (full_scale [128, 512], config).

Batching reuses the padded AliveV2 collate (fixed-shape [B, N, ...] with
masks) instead of the reference's ragged ME concat.
"""

from __future__ import annotations

import glob
import os
import pickle

import numpy as np

from .dataset import AliveV2Dataset, DataConfig


def filter_filename(filepath: str, prefix: str = "") -> bool:
    """v1 eligibility (alivev1.py:79-89): skip semantic sidecars and dark
    captures; optional prefix match."""
    name = filepath.split("/")[-1]
    if name.endswith("_semantic.pickle"):
        return False
    if "dark" in name:
        return False
    if prefix and not name.startswith(prefix):
        return False
    return True


class AliveV1Dataset(AliveV2Dataset):
    """Tuple-pickle dataset with v1 semantics on the padded pipeline."""

    def __init__(self, folder=None, set_name="train", file_names=None,
                 cfg: DataConfig = None, suffix=".pickle", prefix="",
                 full_scale=(128, 512), semantic_enabled=False, **kw):
        self.folder = folder
        self.set_name = set_name
        self.suffix = suffix
        self.prefix = prefix
        self.full_scale = tuple(full_scale)
        self.semantic_enabled = semantic_enabled

        names = list(file_names or ())
        if not names and folder:
            names = sorted(glob.glob(
                os.path.join(folder, set_name, f"*{suffix}")))
        names = [n for n in names if filter_filename(n, prefix)]
        files = [{"filepath": n} for n in names]
        super().__init__(files=files, cfg=cfg, **kw)

    # ------------------------------------------------------------- loading

    def load_data_file(self, i):
        """(tuple, semantic_pred, file_name) — alivev1.py:99-112."""
        path = self.files[i]["filepath"]
        with open(path, "rb") as f:
            x = pickle.load(f, encoding="bytes")
        semantic_pred = None
        if self.semantic_enabled:
            with open(path.replace(".pickle", "_semantic.pickle"),
                      "rb") as f:
                semantic_pred = pickle.load(f, encoding="bytes")
        return x, semantic_pred, path

    def __getitem__(self, i):
        x, semantic_pred, path = self.load_data_file(i)
        if isinstance(x, dict):
            points = np.asarray(x["points"], np.float32)
            rgb = np.asarray(x["rgb"], np.float32)
            labels = np.asarray(x["labels"], np.float32)
            pose = np.asarray(x["pose"], np.float32)
        else:
            points, rgb, labels = (np.asarray(x[0], np.float32),
                                   np.asarray(x[1], np.float32),
                                   np.asarray(x[2], np.float32))
            pose = np.asarray(x[4], np.float32)
        # XYZW -> WXYZ by inserting w at index 3 (alivev1.py:60-61)
        pose = np.insert(pose[:6], 3, pose[-1])

        # v1 full-scale crop: keep points whose scaled coords fit the grid
        scale = self.cfg.scale
        lim = self.full_scale[1] / 2.0 / scale
        m = np.all(np.abs(points) < lim, axis=-1)
        if m.sum() < 1:
            return None
        points, rgb, labels = points[m], rgb[m], labels[m]
        if semantic_pred is not None:
            semantic_pred = np.asarray(semantic_pred)[m]

        n = min(len(points), self.cfg.max_points)
        item = {
            "points": points[:n],
            "feats": rgb[:n],
            "labels": labels[:n].astype(np.int32),
            "pose": pose.astype(np.float32),
            "other": {"filename": path.split("/")[-1],
                      "semantic_pred": semantic_pred},
        }
        return item
