"""Rewrite the robot2ee poses of recorded pickles into a new base frame.

Parity: /root/reference/scripts/change_base_pickle.py — compose each
frame's ee2base pose with a base-change pose and write the pickle back.

  python scripts/change_base_pickle.py <folder> --base-pose x y z qx qy qz qw
"""

import argparse
import glob
import os
import pickle

import numpy as np

from mrcc_tpu.data.dataset import load_sample
from mrcc_tpu.geometry import transform_pose2pose
from mrcc_tpu.geometry.quaternion import wxyz_to_xyzw, xyzw_to_wxyz


def change_base(data, base_pose_xyzw):
    """data: sample dict with 'robot2ee_pose' (XYZW); returns updated."""
    ee2base = np.asarray(data["robot2ee_pose"], np.float64)
    ee2base_w = np.concatenate([ee2base[:3], xyzw_to_wxyz(ee2base[3:7])])
    base_w = np.concatenate([base_pose_xyzw[:3],
                             xyzw_to_wxyz(np.asarray(base_pose_xyzw[3:7]))])
    new_w = np.asarray(transform_pose2pose(ee2base_w, base_w))
    data = dict(data)
    data["robot2ee_pose"] = np.concatenate(
        [new_w[:3], wxyz_to_xyzw(new_w[3:7])]).astype(np.float32)
    return data


def main():
    p = argparse.ArgumentParser()
    p.add_argument("folder")
    p.add_argument("--base-pose", type=float, nargs=7, required=True,
                   help="x y z qx qy qz qw")
    args = p.parse_args()
    for path in sorted(glob.glob(os.path.join(args.folder, "*.pickle"))):
        if path.endswith(("_semantic.pickle", "_eemask.pickle")):
            continue
        data = load_sample(path)
        if "robot2ee_pose" not in data:
            continue
        data = change_base(data, np.asarray(args.base_pose))
        with open(path, "wb") as f:
            pickle.dump(data, f)
        print(path)


if __name__ == "__main__":
    main()
