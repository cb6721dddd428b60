"""Group recorded frames into robot-position instances.

Parity: /root/reference/scripts/instance_finder.py — walk time-ordered
pickles, detect when the robot's ee2base pose jumps (new collection
position), and copy each run of frames into a per-instance folder.

  python scripts/instance_finder.py --infolder rec/ --outfolder fold/
"""

import argparse
import glob
import os
import shutil

import numpy as np

from mrcc_tpu.data.dataset import load_sample
from mrcc_tpu.geometry.quaternion import xyzw_to_wxyz


def find_instances(pickles, pos_threshold=0.01, min_run=5):
    """Yield (instance_id, filepath) for time-ordered frames."""
    last_pose = None
    instance = 0
    run = 0
    for path in pickles:
        data = load_sample(path)
        pose = data.get("robot2ee_pose")
        if pose is None:
            pose = data["pose"]
        pose = xyzw_to_wxyz(np.asarray(pose, np.float64)[3:7])
        pose = np.concatenate([np.asarray(data["pose"][:3], np.float64),
                               pose])
        if last_pose is not None and np.linalg.norm(
                pose[:3] - last_pose[:3]) > pos_threshold:
            if run >= min_run:
                instance += 1
            run = 0
        run += 1
        last_pose = pose
        yield instance, path


def main():
    p = argparse.ArgumentParser(
        description="Find instances for test/calib set")
    p.add_argument("--infolder", type=str, required=True)
    p.add_argument("--outfolder", type=str, default="fold/")
    p.add_argument("--pos-threshold", type=float, default=0.01)
    args = p.parse_args()

    pickles = sorted(
        glob.glob(os.path.join(args.infolder, "*.pickle")),
        key=lambda x: int(os.path.basename(x).split(".")[0]))
    count = 0
    for instance, path in find_instances(pickles, args.pos_threshold):
        dst = os.path.join(args.outfolder, f"p{instance + 1}")
        os.makedirs(dst, exist_ok=True)
        shutil.copy(path, dst)
        count += 1
    print(f"{count} frames distributed into {args.outfolder}")


if __name__ == "__main__":
    main()
