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


class TestPCDReader:
    def _write_ascii_pcd(self, path, pts, rgb):
        packed = ((np.clip(rgb[:, 0] * 255, 0, 255).astype(np.uint32) << 16)
                  | (np.clip(rgb[:, 1] * 255, 0, 255).astype(np.uint32) << 8)
                  | np.clip(rgb[:, 2] * 255, 0, 255).astype(np.uint32))
        rgbf = packed.view(np.float32)
        with open(path, "w") as f:
            f.write("# .PCD v0.7\nVERSION 0.7\nFIELDS x y z rgb\n"
                    "SIZE 4 4 4 4\nTYPE F F F F\nCOUNT 1 1 1 1\n"
                    f"WIDTH {len(pts)}\nHEIGHT 1\n"
                    f"VIEWPOINT 0 0 0 1 0 0 0\nPOINTS {len(pts)}\n"
                    "DATA ascii\n")
            for p, c in zip(pts, rgbf):
                f.write(f"{p[0]:.9g} {p[1]:.9g} {p[2]:.9g} {c:.9g}\n")

    def _write_binary_pcd(self, path, pts, rgb):
        packed = ((np.clip(rgb[:, 0] * 255, 0, 255).astype(np.uint32) << 16)
                  | (np.clip(rgb[:, 1] * 255, 0, 255).astype(np.uint32) << 8)
                  | np.clip(rgb[:, 2] * 255, 0, 255).astype(np.uint32))
        raw = np.zeros((len(pts), 16), np.uint8)
        raw[:, :12] = pts.astype(np.float32).view(np.uint8).reshape(-1, 12)
        raw[:, 12:] = packed[:, None].view(np.uint8).reshape(-1, 4)
        with open(path, "wb") as f:
            f.write(b"VERSION 0.7\nFIELDS x y z rgb\nSIZE 4 4 4 4\n"
                    b"TYPE F F F F\nCOUNT 1 1 1 1\n"
                    + f"WIDTH {len(pts)}\nHEIGHT 1\n".encode()
                    + f"POINTS {len(pts)}\nDATA binary\n".encode())
            f.write(raw.tobytes())

    @pytest.mark.parametrize("fmt", ["ascii", "binary"])
    def test_roundtrip(self, tmp_path, fmt):
        from mrcc_tpu.data.rgbd import read_pcd

        rng = np.random.default_rng(0)
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        rgb = rng.random((50, 3)).astype(np.float32)
        path = str(tmp_path / "c.pcd")
        getattr(self, f"_write_{fmt}_pcd")(path, pts, rgb)
        back_pts, back_rgb = read_pcd(path)
        np.testing.assert_allclose(back_pts, pts, rtol=1e-5)
        np.testing.assert_allclose(back_rgb, rgb, atol=2.0 / 255)

    def test_nan_points_dropped(self, tmp_path):
        from mrcc_tpu.data.rgbd import read_pcd

        pts = np.array([[0, 0, 1], [np.nan, 0, 0], [1, 1, 1]], np.float32)
        rgb = np.zeros((3, 3), np.float32)
        path = str(tmp_path / "c.pcd")
        self._write_binary_pcd(path, pts, rgb)
        back_pts, _ = read_pcd(path)
        assert len(back_pts) == 2


class TestSmallScripts:
    def test_consolidate_and_instance_finder(self, tmp_path):
        import pickle as pkl

        from consolidate_ee_poses import main as consolidate  # noqa: F401
        from instance_finder import find_instances

        from mrcc_tpu.data.synthetic import generate_sample

        # two "positions": frames 0-4 near pose A, 5-9 near pose B
        paths = []
        for i in range(10):
            s = generate_sample(seed=7, n_ee=100, n_arm=100, n_bg=100)
            s = dict(s)
            base = np.zeros(7, np.float32)
            base[:3] = (0 if i < 5 else 0.5)
            base[6] = 1.0
            s["pose"] = (np.asarray(s["pose"]) * 0 + base).astype(np.float32)
            p = tmp_path / f"{i}.pickle"
            with open(p, "wb") as f:
                pkl.dump(s, f)
            paths.append(str(p))
        groups = {}
        for inst, path in find_instances(paths, pos_threshold=0.1,
                                         min_run=3):
            groups.setdefault(inst, []).append(path)
        assert len(groups) == 2
        assert len(groups[0]) == 5 and len(groups[1]) == 5

    def test_change_base(self, tmp_path):
        from change_base_pickle import change_base

        data = {"robot2ee_pose": np.array([0.1, 0.2, 0.3, 0, 0, 0, 1],
                                          np.float32)}
        # identity base change leaves the pose untouched
        out = change_base(data, np.array([0, 0, 0, 0, 0, 0, 1.0]))
        np.testing.assert_allclose(out["robot2ee_pose"],
                                   data["robot2ee_pose"], atol=1e-6)

    def test_ycb_splitter(self, tmp_path):
        from ycb_splitter import build_splits

        for name in ("001_chips_can", "072-a_toy_airplane", "025_mug"):
            d = tmp_path / name / "clouds"
            d.mkdir(parents=True)
            for i in range(10):
                (d / f"pc_NP1_{i}.ply").write_text("ply")
        splits = build_splits(str(tmp_path))
        names = {e["class_name"] for v in splits.values() for e in v}
        assert "072-a_toy_airplane" not in names  # filtered
        total = sum(len(v) for v in splits.values())
        assert total == 20


class TestDirectoryDataEnginePCD:
    def test_pcd_with_pose_sidecar(self, tmp_path):
        from mrcc_tpu.app.calibrate_pcd import DirectoryDataEngine

        rng = np.random.default_rng(0)
        pts = rng.normal(size=(30, 3)).astype(np.float32)
        rgb = rng.random((30, 3)).astype(np.float32)
        TestPCDReader()._write_binary_pcd(str(tmp_path / "0001.pcd"), pts,
                                          rgb)
        np.save(str(tmp_path / "0001_pose.npy"),
                np.array([1, 2, 3, 0, 0, 0, 1.0]))
        eng = DirectoryDataEngine(str(tmp_path))
        dto = eng.get()
        assert dto is not None and len(dto.points) == 30
        np.testing.assert_allclose(dto.ee2base_pose,
                                   [1, 2, 3, 1, 0, 0, 0])  # wxyz
        assert eng.get() is None
