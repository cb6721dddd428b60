"""Smoke tests for the remaining CLI trainers (pose, keypoints, kp_to_pose,
feature extractor) on tiny synthetic configs."""

import numpy as np
import pytest

from mrcc_tpu.config import Config

# slow tier: end-to-end CLI training loops — run with --full or scripts/test_on_tpu.py
pytestmark = pytest.mark.slow


def tiny_cfg(tmp_path, dataset_dir=None, **structure):
    import os as _os
    split = (str(tmp_path / "ds" / "sample_splits.json") if dataset_dir is None
             else _os.path.join(dataset_dir, "sample_splits.json"))
    return Config(
        overrides={
            "DATA": {"file_names": split,
                     "batch_size": 2, "max_npoint": 2048, "scale": 200,
                     "num_of_dense_input_points": 256,
                     "num_of_keypoints": 6},
            "STRUCTURE": {"backbone": "minkunet14A", **structure},
            "TRAIN": {"epochs": 1, "lr": 1e-3},
        },
        exp_path=str(tmp_path / "exp"),
    )


class TestTrainCLIs:
    def test_train_pose_encode(self, tmp_path, tiny_dataset_dir):
        from mrcc_tpu.cli.train_mains import train_pose

        cfg = tiny_cfg(tmp_path, dataset_dir=tiny_dataset_dir, encode_only=True)
        hist = train_pose(cfg, epochs=1)
        assert len(hist) == 1
        assert np.isfinite(hist[0]["loss"])

    def test_train_key_points_sparse(self, tmp_path, tiny_dataset_dir):
        from mrcc_tpu.cli.train_mains import train_key_points

        cfg = tiny_cfg(tmp_path, dataset_dir=tiny_dataset_dir)
        hist = train_key_points(cfg, epochs=1)
        assert len(hist) == 1 and np.isfinite(hist[0]["loss"])

    def test_train_kp_to_pose(self, tmp_path, tiny_dataset_dir):
        from mrcc_tpu.cli.train_mains import train_kp_to_pose

        cfg = tiny_cfg(tmp_path, dataset_dir=tiny_dataset_dir)
        hist = train_kp_to_pose(cfg, epochs=1)
        assert len(hist) == 1
        assert hist[0]["loss"] is None or np.isfinite(hist[0]["loss"])

    def test_train_feature_extractor(self, tmp_path, tiny_dataset_dir):
        from mrcc_tpu.cli.train_mains import train_feature_extractor

        cfg = tiny_cfg(tmp_path, dataset_dir=tiny_dataset_dir)
        hist = train_feature_extractor(cfg, epochs=1)
        assert len(hist) == 1 and np.isfinite(hist[0]["loss"])


class TestTestCLIs:
    def test_test_pose(self, tmp_path, tiny_dataset_dir):
        from mrcc_tpu.cli.test_mains import test_pose

        cfg = tiny_cfg(tmp_path, dataset_dir=tiny_dataset_dir, encode_only=True)
        res = test_pose(cfg)
        assert "overall" in res

    def test_test_feature_extractor(self, tmp_path, tiny_dataset_dir):
        from mrcc_tpu.cli.test_mains import test_feature_extractor

        cfg = tiny_cfg(tmp_path, dataset_dir=tiny_dataset_dir)
        res = test_feature_extractor(cfg)
        assert 0.0 <= res["recall@1"] <= 1.0
