"""Data layer: sample schema, label generation, synthetic scenes, pipeline."""

from . import augmentation, dataset, labels, synthetic  # noqa: F401
from .dataset import AliveV2Dataset, DataConfig, load_sample, merge_split_files  # noqa: F401
from .synthetic import generate_sample, gt_base2cam_pose, write_sample_set  # noqa: F401
