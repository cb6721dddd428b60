"""Eval harnesses, report writer, config system, CLI mains (smoke)."""

import json
import os

import numpy as np
import pytest

from mrcc_tpu.config import Config
from mrcc_tpu.data import AliveV2Dataset, DataConfig, generate_sample


@pytest.fixture(scope="module")
def small_cfg(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    return Config(
        overrides={
            "DATA": {"file_names": str(tmp / "ds" / "sample_splits.json"),
                     "batch_size": 2, "max_npoint": 4096, "scale": 200},
            "STRUCTURE": {"backbone": "minkunet14A"},
            "TRAIN": {"epochs": 1},
            "TEST": {"split": "test"},
        },
        exp_path=str(tmp / "exp"),
    )


class TestConfig:
    def test_defaults_schema(self):
        cfg = Config()
        assert cfg()["DATA"]["scale"] == 100
        assert cfg()["TRAIN"]["loss_type"] == "cos2"
        assert cfg.MODE == "train"
        assert cfg.DATA.classes == 3  # attribute access

    def test_override_merge(self, tmp_path):
        p = tmp_path / "override.yaml"
        p.write_text("DATA:\n  scale: 999\nTRAIN:\n  lr: 0.5\n")
        cfg = Config(override_paths=[str(p)])
        assert cfg()["DATA"]["scale"] == 999
        assert cfg()["DATA"]["classes"] == 3  # untouched keys survive
        assert cfg()["TRAIN"]["lr"] == 0.5

    def test_from_args(self):
        cfg = Config.from_args(["--exp_path", "/tmp/x"])
        assert cfg.exp_path == "/tmp/x"

    def test_bridges(self):
        cfg = Config()
        assert cfg.data_config().scale == 100
        assert cfg.train_config().epochs == 1300
        assert cfg.loss_config().loss_type.value == "cos2"
        assert cfg.inference_config().kp_scale == 800

    def test_save(self, tmp_path):
        cfg = Config(exp_path=str(tmp_path / "exp"))
        cfg.save()
        assert (tmp_path / "exp" / "default.yaml").exists()


class TestReport:
    def test_write_report_csv(self, tmp_path):
        from mrcc_tpu.eval.report import write_report

        metrics = {"nn_translation_m": [0.01, 0.02, 0.03],
                   "nn_rotation_rad": [0.1, 0.2, None]}
        path, table = write_report(metrics, str(tmp_path / "out.xlsx"))
        assert os.path.exists(path)
        assert os.path.exists(tmp_path / "out.json")
        assert abs(table["nn_translation_m"]["Avg"] - 0.02) < 1e-9
        assert table["nn_rotation_rad"]["N"] == 2


class TestEvalHarness:
    @pytest.fixture(scope="class")
    def ds(self):
        samples = [generate_sample(seed=s, n_ee=600, n_arm=800, n_bg=1200)
                   for s in (31, 32)]
        cfg = DataConfig(data_type=None, max_points=4096, scale=200)
        return AliveV2Dataset(samples=samples, cfg=cfg)

    def test_evaluate_segmentation(self, ds, tmp_path):
        import jax

        from mrcc_tpu.eval import evaluate_segmentation
        from mrcc_tpu.models import RobotNetSegmentation
        from mrcc_tpu.sparse import build_hierarchy, voxelize
        import jax.numpy as jnp

        model = RobotNetSegmentation(backbone="minkunet14A", in_channels=3,
                                     num_classes=3)
        batch = ds.collate([ds[0]])
        vox, _, _ = voxelize(jnp.asarray(batch["points"]),
                             jnp.asarray(batch["feats"]),
                             jnp.asarray(batch["mask"]), 1 / 200.0, 2048)
        levels = build_hierarchy(vox, 4, capacities=(2048, 1024, 512, 256))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), vox.feats,
                                        levels)
        out = str(tmp_path / "seg.json")
        res = evaluate_segmentation(model, variables, ds, voxel_capacity=2048,
                                    batch_size=2, out_path=out)
        assert len(res["instances"]) == 2
        assert os.path.exists(out)
        data = json.load(open(out))
        assert "overall" in data

    def test_evaluate_pose(self, ds, tmp_path):
        import jax

        from mrcc_tpu.eval import evaluate_pose
        from mrcc_tpu.models import RobotNetEncode

        # ee_seg crop dataset for the pose head
        samples = [generate_sample(seed=41, n_ee=800, n_arm=400, n_bg=400)]
        cfg = DataConfig(data_type="ee_seg", max_points=2048, scale=200)
        ds_ee = AliveV2Dataset(samples=samples, cfg=cfg)
        model = RobotNetEncode(backbone="minkunet14A", in_channels=3,
                               out_channels=7)

        import jax.numpy as jnp

        from mrcc_tpu.sparse import build_hierarchy, voxelize

        batch = ds_ee.collate([ds_ee[0]])
        vox, _, _ = voxelize(jnp.asarray(batch["points"]),
                             jnp.asarray(batch["feats"]),
                             jnp.asarray(batch["mask"]), 1 / 200.0, 1024)
        levels = build_hierarchy(vox, 4, capacities=(1024, 512, 256, 128))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), vox.feats,
                                        levels)
        res = evaluate_pose(model, variables, ds_ee, voxel_capacity=1024,
                            batch_size=1,
                            out_path=str(tmp_path / "pose.json"))
        assert res["overall"]["dist_position"]["count"] == 1
        assert np.isfinite(res["overall"]["dist_position"]["avg"])


@pytest.mark.slow
class TestBenchmarkApp:
    def test_end_to_end_benchmark(self, tmp_path):
        from mrcc_tpu.app import (InferenceConfig, InferenceEngine,
                                  SyntheticDataEngine)
        from mrcc_tpu.data.synthetic import gt_base2cam_pose
        from mrcc_tpu.eval.benchmark import BenchmarkApp

        cfg = InferenceConfig(
            point_capacity=4096, seg_voxel_capacity=2048,
            ee_point_capacity=1024, ee_voxel_capacity=1024,
            kp_voxel_capacity=1024, seg_backbone="minkunet14A",
            rot_backbone="minkunet14A", kp_backbone="minkunet14A",
            icp_iterations=5, icp_template_points=256,
            ee_point_counts_threshold=32, sanity_min_num_of_ee_points=64)
        engine = InferenceEngine(cfg, seed=0)
        source = SyntheticDataEngine(seed=50, n_ee=512, n_arm=600, n_bg=1200)
        app = BenchmarkApp(engine, source, gt_base2cam_pose(), n_samples=3,
                           ignore_unconfident=False)
        res = app.run(out_path=str(tmp_path / "bench.xlsx"))
        assert "seg_accuracy" in res["metrics"]
        assert res["report"] is not None
        assert os.path.exists(res["report"])


@pytest.mark.slow
class TestCLISmoke:
    def test_train_and_test_vote(self, small_cfg):
        # exercises dataset bootstrap + vote training one epoch + vote eval
        from mrcc_tpu.cli.test_mains import test_vote
        from mrcc_tpu.cli.train_mains import train_vote

        hist = train_vote(small_cfg, epochs=1)
        assert len(hist) == 1 and np.isfinite(hist[0]["loss"])
        res = test_vote(small_cfg)
        assert "overall" in res


class TestPerPositionReport:
    def test_write_report_with_positions(self, tmp_path):
        from mrcc_tpu.eval.report import write_report

        metrics = {"nn_translation_m": [0.01, 0.02, 0.03],
                   "seg_ee_precision": [0.9, 0.95, 0.85]}
        pos = {"p1": {"nn_translation_m": [0.01],
                      "seg_ee_precision": [0.9]},
               "p2": {"nn_translation_m": [0.02, 0.03],
                      "seg_ee_precision": [0.95, 0.85]}}
        path, table = write_report(metrics, str(tmp_path / "out.xlsx"),
                                   position_metrics=pos)
        import json as _json

        blob = _json.load(open(str(tmp_path / "out.json")))
        assert set(blob["positions"]) == {"p1", "p2"}
        assert blob["positions"]["p2"]["nn_translation_m"]["N"] == 2
        text = open(path).read() if path.endswith(".csv") else ""
        if text:
            assert "OVERALL" in text and "p2" in text

    @pytest.mark.slow
    def test_benchmark_app_per_class_and_positions(self):
        from mrcc_tpu.app import (InferenceConfig, InferenceEngine,
                                  SyntheticDataEngine)
        from mrcc_tpu.data.synthetic import gt_base2cam_pose
        from mrcc_tpu.eval.benchmark import BenchmarkApp

        cfg = InferenceConfig(
            point_capacity=2048, seg_voxel_capacity=512,
            ee_point_capacity=256, ee_voxel_capacity=256,
            kp_voxel_capacity=256, seg_backbone="minkunet14A",
            rot_backbone="minkunet14A", kp_backbone="minkunet14A",
            icp_iterations=2, icp_template_points=128,
            ee_point_counts_threshold=16, sanity_min_num_of_ee_points=16)
        engine = InferenceEngine(cfg, seed=0)
        source = SyntheticDataEngine(seed=3, n_ee=300, n_arm=400, n_bg=500)
        app = BenchmarkApp(engine, source, gt_base2cam_pose(), n_samples=2,
                           ignore_unconfident=False)
        out = app.run()
        assert "seg_ee_precision" in out["metrics"]
        assert "seg_arm_recall" in out["metrics"]
        assert out["positions"]  # grouped by position key
