"""The checked-in experiment override YAMLs drive real training runs.

Mirrors the reference reproduction workflow (README.md:37-46):
``--config default.yaml --override <experiment>.yaml``.  A size-shrinking
test override is stacked on top (the same composition mechanism) so each
experiment runs one epoch on the synthetic bootstrap set within CPU test
budgets — what's validated is that every checked-in YAML parses, selects
the intended model/loss/data path, and completes a training epoch.
"""

import os

import numpy as np
import pytest
import yaml

from mrcc_tpu.config import Config

OVERRIDES_DIR = os.path.join(os.path.dirname(__file__), "..", "mrcc_tpu",
                             "config", "overrides")


def cfg_with(tmp_path, name, backbone="minkunet14A", dataset_dir=None,
             **tiny_data):
    split = (str(tmp_path / "ds" / "sample_splits.json") if dataset_dir is None
             else str(__import__("os").path.join(dataset_dir,
                                                 "sample_splits.json")))
    tiny = {
        "DATA": {"file_names": split,
                 "batch_size": 2, "max_npoint": 2048,
                 "num_of_dense_input_points": 128, **tiny_data},
        "TRAIN": {"epochs": 1},
    }
    if backbone is not None:  # None = keep the experiment's own backbone
        tiny["STRUCTURE"] = {"backbone": backbone}
    tiny_path = tmp_path / "tiny.yaml"
    tiny_path.write_text(yaml.safe_dump(tiny))
    return Config(
        override_paths=[os.path.join(OVERRIDES_DIR, name), str(tiny_path)],
        exp_path=str(tmp_path / "exp"),
    )


class TestOverrideReproductions:
    @pytest.mark.slow
    def test_segmentation(self, tmp_path, tiny_dataset_dir):
        from mrcc_tpu.cli.train_mains import train_segmentation

        cfg = cfg_with(tmp_path, "override_segmentation.yaml", dataset_dir=tiny_dataset_dir)
        assert cfg()["TRAIN"]["loss_reduction"] == "sum"
        assert cfg()["DATA"]["scale"] == 200
        hist = train_segmentation(cfg, epochs=1)
        assert len(hist) == 1 and np.isfinite(hist[0]["loss"])

    @pytest.mark.slow
    def test_rotation_only(self, tmp_path, tiny_dataset_dir):
        from mrcc_tpu.cli.train_mains import train_pose

        cfg = cfg_with(tmp_path, "override_rotation_only.yaml", dataset_dir=tiny_dataset_dir)
        assert cfg()["STRUCTURE"]["disable_position"] is True
        assert cfg()["TRAIN"]["loss_type"] == "pose"
        hist = train_pose(cfg, epochs=1)
        assert len(hist) == 1 and np.isfinite(hist[0]["loss"])

    @pytest.mark.slow
    def test_key_points_sparse(self, tmp_path, tiny_dataset_dir):
        from mrcc_tpu.cli.train_mains import train_key_points

        cfg = cfg_with(tmp_path, "override_key_points_sparse.yaml", dataset_dir=tiny_dataset_dir)
        assert cfg()["DATA"]["keypoints_enabled"] is True
        hist = train_key_points(cfg, epochs=1)
        assert len(hist) == 1 and np.isfinite(hist[0]["loss"])

    def test_kp_to_pose(self, tmp_path, tiny_dataset_dir):
        from mrcc_tpu.cli.train_mains import train_kp_to_pose

        cfg = cfg_with(tmp_path, "override_kp_to_pose.yaml", backbone=None, dataset_dir=tiny_dataset_dir)
        assert cfg()["TRAIN"]["loss_type"] == "kp_pose_match"
        assert cfg()["STRUCTURE"]["backbone"] == "pointnet2"
        hist = train_kp_to_pose(cfg, epochs=1)
        assert len(hist) == 1
        assert hist[0]["loss"] is None or np.isfinite(hist[0]["loss"])

    @pytest.mark.slow
    def test_vote(self, tmp_path, tiny_dataset_dir):
        from mrcc_tpu.cli.train_mains import train_vote

        cfg = cfg_with(tmp_path, "override_vote.yaml", dataset_dir=tiny_dataset_dir)
        assert cfg()["DATA"]["voting_enabled"] is True
        hist = train_vote(cfg, epochs=1)
        assert len(hist) == 1 and np.isfinite(hist[0]["loss"])

    def test_all_overrides_parse(self, tmp_path):
        for name in sorted(os.listdir(OVERRIDES_DIR)):
            cfg = Config(override_paths=[os.path.join(OVERRIDES_DIR, name)],
                         exp_path=str(tmp_path / "exp"))
            assert cfg()["DATA"]  # merged over defaults

    @pytest.mark.slow
    def test_inference_mode_builds_engine_from_yaml(self, tmp_path, tiny_dataset_dir):
        """MODE: inference — engine construction from checkpoint fields
        written by a (tiny) training run (reference ctor :54-126)."""
        import flax.serialization

        from mrcc_tpu.app import InferenceEngine
        from mrcc_tpu.cli.train_mains import train_segmentation

        cfg = cfg_with(tmp_path, "override_segmentation.yaml", dataset_dir=tiny_dataset_dir)
        train_segmentation(cfg, epochs=1)
        ckpts = [f for f in os.listdir(cfg.exp_path) if f.endswith(".ckpt")]
        assert ckpts, "training run left no checkpoint"
        ckpt_path = os.path.join(cfg.exp_path, ckpts[0])

        inf_cfg = Config(
            override_paths=[os.path.join(OVERRIDES_DIR,
                                         "override_inference.yaml")],
            overrides={"INFERENCE": {
                "SEGMENTATION": {"checkpoint": ckpt_path,
                                 "backbone": "minkunet14A"},
                "ROTATION": {"checkpoint": None, "backbone": "minkunet14A"},
                "KEY_POINTS": {"checkpoint": None, "backbone": "minkunet14A"},
            }},
            exp_path=str(tmp_path / "exp_inf"),
        )
        assert inf_cfg()["MODE"] == "inference"
        icfg = inf_cfg.inference_config()
        icfg.point_capacity = 2048
        icfg.seg_voxel_capacity = 512
        icfg.ee_point_capacity = 256
        icfg.ee_voxel_capacity = 256
        icfg.kp_voxel_capacity = 256
        icfg.icp_iterations = 2
        icfg.icp_template_points = 128
        engine = InferenceEngine(icfg, seed=3)

        # the engine's seg weights ARE the trained checkpoint's weights
        with open(ckpt_path, "rb") as f:
            raw = flax.serialization.msgpack_restore(f.read())

        def leaves(d, prefix=()):
            for k, v in d.items():
                if isinstance(v, dict):
                    yield from leaves(v, prefix + (k,))
                else:
                    yield prefix + (k,), np.asarray(v)

        ckpt_leaves = dict(leaves(raw["params"]))
        eng_leaves = dict(leaves(engine.params["segmentation"]["params"]))
        assert set(ckpt_leaves) == set(eng_leaves)
        for path in ckpt_leaves:
            np.testing.assert_allclose(ckpt_leaves[path],
                                       np.asarray(eng_leaves[path]),
                                       err_msg="/".join(path))


class TestRobustnessLeverYaml:
    """YAML plumbing for the opt-in r5 levers (defaults = reference parity)."""

    def test_inference_lever_keys(self, tmp_path):
        import yaml as _yaml

        p = tmp_path / "lever.yaml"
        p.write_text(_yaml.safe_dump({
            "INFERENCE": {"rot_flip_disambiguation": True,
                          "rot_symmetry_axis": "z",
                          "translation_z_percentile": 2.0}}))
        cfg = Config(override_paths=[str(p)],
                     exp_path=str(tmp_path / "exp"))
        icfg = cfg.inference_config()
        assert icfg.rot_flip_disambiguation is True
        assert icfg.translation_z_percentile == 2.0

    def test_defaults_preserve_reference_behavior(self, tmp_path):
        cfg = Config(exp_path=str(tmp_path / "exp"))
        icfg = cfg.inference_config()
        assert icfg.rot_flip_disambiguation is False
        assert icfg.translation_z_percentile is None
