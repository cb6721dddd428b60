"""Shared CLI plumbing for the train/test entry scripts.

Reproduces the reference workflow: ``python3 train*.py --config <yaml>
--override <yaml>`` (README.md:24-46), with a synthetic-dataset bootstrap
replacing the LFS-missing sample set.
"""

from __future__ import annotations

import os

import numpy as np

from ..config import Config
from ..data.dataset import AliveV2Dataset, DataConfig, merge_split_files
from ..utils.logger import get_logger


def ensure_dataset(cfg: Config, n=6):
    """Return split-file paths; generate a synthetic sample set if the
    configured split JSON is missing (the reference's dataset is external)."""
    paths = str(cfg()["DATA"].get("file_names", "")).split(",")
    missing = [p for p in paths if not os.path.isfile(p)]
    if missing:
        from ..data.synthetic import write_sample_set

        out_dir = os.path.dirname(missing[0]) or "dataset/synthetic"
        get_logger().info(
            f"split file(s) missing; generating synthetic sample set in "
            f"{out_dir}")
        write_sample_set(out_dir, n=n)
        paths = [os.path.join(out_dir, "sample_splits.json")]
    return paths


def make_datasets(cfg: Config, data_cfg: DataConfig = None, dense=False,
                  splits=("train", "val")):
    """Build datasets for the requested splits from the config."""
    data_cfg = data_cfg or cfg.data_config()
    paths = ensure_dataset(cfg)
    out = []
    augment_cfg = bool(data_cfg.augmentation)
    for split in splits:
        files = merge_split_files(paths, split=split,
                                  prefix=cfg()["DATA"].get("prefix", ""))
        if dense:
            from ..data.dense import AliveV2DenseDataset

            ds = AliveV2DenseDataset(
                files=files, cfg=data_cfg,
                augment=augment_cfg and split == "train",
                num_points=cfg()["DATA"].get("num_of_dense_input_points",
                                             2048),
                sampling=cfg()["DATA"].get("pointcloud_sampling_method",
                                           "uniform"))
        else:
            ds = AliveV2Dataset(files=files, cfg=data_cfg,
                                augment=augment_cfg and split == "train")
        out.append(ds)
    return out if len(out) > 1 else out[0]


def exp_name_of(cfg: Config) -> str:
    base = os.path.basename(cfg.config_path)
    return os.path.splitext(base)[0]


def select_pose_model(cfg: Config):
    """Model selection parity (train.py:259-276)."""
    from ..models import RobotNet, RobotNetEncode

    s = cfg()["STRUCTURE"]
    backbone = s.get("backbone", "minkunet")
    out_channels = 10 if s.get("compute_confidence") else 7
    if backbone.startswith("pointnet"):
        from ..models.pointnet2 import PointNet2SSG

        return PointNet2SSG(num_classes=out_channels), out_channels
    cls = RobotNetEncode if s.get("encode_only") else RobotNet
    d = cfg()["DATA"]
    kw = {}
    if cls is RobotNetEncode:
        kw = dict(voxelize_position=d.get("voxelize_position", False),
                  quantization_size=1.0 / d.get("scale", 100))
    model = cls(backbone=backbone, in_channels=d.get("input_channel", 3),
                out_channels=out_channels,
                use_joint_angles=s.get("use_joint_angles", False), **kw)
    return model, out_channels
