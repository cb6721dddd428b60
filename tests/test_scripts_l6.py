"""L6 tooling: RGB-D pipeline, dataset splitter, EE-mask extractor."""

import json
import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from mrcc_tpu.data.rgbd import (  # noqa: E402
    depth_to_cloud,
    filter_discontinuities,
    register_depth_map,
    write_ply,
)


class TestRGBD:
    K = np.array([[525.0, 0, 320.0], [0, 525.0, 240.0], [0, 0, 1.0]])

    def test_unproject_roundtrip(self):
        # plane at z=1.5m: unprojected points must lie on the plane and
        # reproject to their own pixels
        depth = np.full((120, 160), 1.5)
        rgb = np.zeros((120, 160, 3), np.uint8)
        k = self.K / 4.0
        k[2, 2] = 1.0
        cloud = depth_to_cloud(depth, rgb, k, organized=True)
        assert np.allclose(cloud[..., 2], 1.5)
        u = cloud[..., 0] * k[0, 0] / cloud[..., 2] + k[0, 2]
        np.testing.assert_allclose(u, np.arange(160)[None, :] * np.ones(
            (120, 1)), atol=1e-9)

    def test_discontinuity_filter_kills_step_edge(self):
        depth = np.full((64, 64), 2000.0)
        depth[:, 32:] = 5000.0  # 3m step
        out = filter_discontinuities(depth, filt_size=7, thresh=1000)
        # pixels near the edge are zeroed, far pixels survive
        assert (out[:, 29:35] == 0).any()
        assert (out[:, :20] == 2000).all() and (out[:, 44:] == 5000).all()

    def test_register_identity(self):
        # same camera, identity extrinsics: registration reproduces depth
        rng = np.random.default_rng(0)
        depth = rng.uniform(0.5, 2.0, size=(60, 80))
        reg = register_depth_map(depth, (60, 80), self.K / 8.0 + np.diag(
            [0, 0, 0.875]), self.K / 8.0 + np.diag([0, 0, 0.875]),
            np.eye(4))
        good = reg > 0
        assert good.mean() > 0.95
        np.testing.assert_allclose(reg[good], depth[good], rtol=1e-9)

    def test_write_ply_parses_back(self, tmp_path):
        cloud = np.zeros((1, 4, 6))
        cloud[0, :, :3] = np.arange(12).reshape(4, 3)
        cloud[0, :, 3:] = 255
        path = write_ply(str(tmp_path / "c.ply"), cloud)
        lines = open(path).read().strip().split("\n")
        assert lines[0] == "ply" and "element vertex 4" in lines[2]
        assert lines[-1].split()[:3] == ["9", "10", "11"]


class TestSplitterAndEEMask:
    @pytest.fixture()
    def sample_tree(self, tmp_path):
        from mrcc_tpu.data.synthetic import write_sample_set

        # layout expected by the splitter: <pos_light>/labeled/*.pickle
        write_sample_set(tmp_path / "p1_bright", n=4)
        write_sample_set(tmp_path / "p2_dark", n=4, seed0=10)
        return tmp_path

    def test_build_splits(self, sample_tree):
        from alivev2_splitter import build_splits

        splits = build_splits(str(sample_tree), ratio=(0.5, 0.25, 0.25))
        total = sum(len(v) for v in splits.values())
        assert total == 8
        ins = splits["train"][0]
        assert set(ins) >= {"filepath", "position", "light",
                            "arm_point_count"}
        assert ins["arm_point_count"] > 0
        assert ins["light"] in ("bright", "dark")

    def test_eemask_extractor(self, sample_tree):
        from alivev2_splitter import build_splits
        from eemask_extractor import extract

        splits = build_splits(str(sample_tree), ratio=(1.0, 0.0, 0.0))
        written = extract({"train": splits["train"][:2]})
        assert len(written) == 2
        for path in written:
            with open(path, "rb") as f:
                idx = pickle.load(f)
            assert len(idx) > 50  # the synthetic EE has hundreds of points
            # indices select points near the EE pose
            src = path.replace("_eemask.pickle", ".pickle")
            with open(src, "rb") as f:
                data = pickle.load(f)
            pose_pos = np.asarray(data["pose"][:3])
            d = np.linalg.norm(np.asarray(data["points"])[idx] - pose_pos,
                               axis=1)
            assert np.median(d) < 0.25
