"""Extract end-effector point masks from labeled pickles.

Parity: /root/reference/scripts/eemask_extractor.py — the reference builds
an Open3D OrientedBoundingBox ([0.15, 0.27, 0.18] dims, +3 cm z-offset in
the EE frame) and dumps the in-box indices to ``*_eemask.pickle``; here
the same oriented-box membership is computed with the repo's geometric EE
crop (data/labels.get_ee_idx — same box semantics, no Open3D).

  python scripts/eemask_extractor.py --splits splits.json
"""

import argparse
import json
import pickle

import numpy as np

from mrcc_tpu.data.dataset import load_sample
from mrcc_tpu.data.labels import get_ee_idx


def extract(splits):
    written = []
    for split in splits.values():
        for ins in split:
            path = ins["filepath"]
            data = load_sample(path)
            points = np.asarray(data["points"])
            pose = np.asarray(data["pose"], np.float64)
            # stored poses are XYZW; get_ee_idx expects WXYZ
            pose = np.concatenate([pose[:3], pose[6:7], pose[3:6]])
            ee_idx = get_ee_idx(points, pose)
            out = path.replace(".pickle", "_eemask.pickle")
            with open(out, "wb") as f:
                pickle.dump(np.asarray(ee_idx), f)
            written.append(out)
    return written


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--splits", required=True)
    args = p.parse_args()
    with open(args.splits) as f:
        splits = json.load(f)
    written = extract(splits)
    print(f"wrote {len(written)} eemask files")


if __name__ == "__main__":
    main()
