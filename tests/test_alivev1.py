"""AliveV1 dataset: v1 tuple-pickle schema, filtering, crop, pose insert."""

import os
import pickle

import numpy as np

from mrcc_tpu.data.alivev1 import AliveV1Dataset, filter_filename
from mrcc_tpu.data.dataset import DataConfig
from mrcc_tpu.data.synthetic import generate_sample


def test_filter_filename():
    assert not filter_filename("a/b/x_semantic.pickle")
    assert not filter_filename("a/b/dark_1.pickle")
    assert filter_filename("a/b/1.pickle")
    assert not filter_filename("a/b/other.pickle", prefix="scene")
    assert filter_filename("a/b/scene_1.pickle", prefix="scene")


def test_v1_dataset(tmp_path):
    os.makedirs(tmp_path / "train", exist_ok=True)
    tup = None
    for i in range(3):
        s = generate_sample(seed=i, n_ee=300, n_arm=400, n_bg=500)
        tup = (s["points"], s["rgb"], s["labels"], s["instance_labels"],
               s["pose"])
        with open(tmp_path / "train" / f"{i}.pickle", "wb") as f:
            pickle.dump(tup, f)
    # distractors: semantic sidecar + dark capture
    with open(tmp_path / "train" / "0_semantic.pickle", "wb") as f:
        pickle.dump(np.zeros(3), f)
    with open(tmp_path / "train" / "dark_scene.pickle", "wb") as f:
        pickle.dump(tup, f)

    ds = AliveV1Dataset(folder=str(tmp_path), set_name="train",
                        cfg=DataConfig(scale=200, max_points=2048))
    assert len(ds) == 3  # sidecar + dark excluded
    item = ds[0]
    assert item is not None
    s = generate_sample(seed=0, n_ee=300, n_arm=400, n_bg=500)
    want = np.insert(np.asarray(s["pose"])[:6], 3, s["pose"][-1])
    np.testing.assert_allclose(item["pose"], want, rtol=1e-6)
    batch = ds.collate([ds[0], ds[1]])
    assert batch["points"].shape == (2, 2048, 3)
    assert batch["mask"].any()


def test_v1_full_scale_crop(tmp_path):
    os.makedirs(tmp_path / "train", exist_ok=True)
    pts = np.array([[0.0, 0, 0], [10.0, 0, 0]], np.float32)  # far point
    tup = (pts, np.zeros((2, 3), np.float32), np.zeros(2, np.float32),
           np.zeros(2), np.array([0, 0, 0, 0, 0, 0, 1], np.float32))
    with open(tmp_path / "train" / "1.pickle", "wb") as f:
        pickle.dump(tup, f)
    ds = AliveV1Dataset(folder=str(tmp_path), set_name="train",
                        cfg=DataConfig(scale=200, max_points=64),
                        full_scale=(128, 512))
    item = ds[0]
    assert len(item["points"]) == 1  # 10m point crops out (512/2/200=1.28m)
