"""Split generated YCB object clouds into train/val/test class folders.

Parity: /root/reference/scripts/ycb_splitter.py — filter problematic
object classes, then split each object's generated clouds by ratio.

  python scripts/ycb_splitter.py --infolder ycb/ --out ycb_splits.json
"""

import argparse
import glob
import json
import os
import random

NOK_SUBSTRINGS = ("airplane", "lego_duplo", "_cups", "_marbles")


def filter_folder(path):
    if path.endswith("zip") or not os.path.isdir(path):
        return False
    return not any(s in path for s in NOK_SUBSTRINGS)


def build_splits(infolder, ratio=(0.8, 0.1, 0.1), seed=1):
    random.seed(seed)
    out = {"train": [], "val": [], "test": []}
    folders = sorted(p for p in glob.glob(os.path.join(infolder, "*"))
                     if filter_folder(p))
    for ci, folder in enumerate(folders):
        clouds = sorted(glob.glob(os.path.join(folder, "clouds", "*.ply")))
        random.shuffle(clouds)
        bounds = [0]
        for r in ratio:
            bounds.append(bounds[-1] + int(r * len(clouds)))
        bounds[-1] = len(clouds)
        for split, lo, hi in zip(out, bounds[:-1], bounds[1:]):
            out[split].extend(
                {"filepath": c, "class_id": ci,
                 "class_name": os.path.basename(folder)}
                for c in clouds[lo:hi])
    return out


def main():
    p = argparse.ArgumentParser(description="Split YCB")
    p.add_argument("--infolder", type=str, default="ycb/")
    p.add_argument("--out", type=str, default="ycb_splits.json")
    p.add_argument("--ratio", nargs=3, type=float, default=[0.8, 0.1, 0.1])
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args()
    splits = build_splits(args.infolder, tuple(args.ratio), args.seed)
    with open(args.out, "w") as f:
        json.dump(splits, f, indent=4)
    print({k: len(v) for k, v in splits.items()})


if __name__ == "__main__":
    main()
