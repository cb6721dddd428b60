"""Split per-class YCB cloud folders into train/val/test directories.

Parity: /root/reference/scripts/ycb_data_prep.py — walks
``<infolder>/<class>/clouds/*.pcd``, shuffles, splits by ratio and
copies (or moves) each file to ``<outfolder>/<split>/<class>_<name>.pcd``.

  python scripts/ycb_data_prep.py --infolder ycb/ --outfolder ycb_out/
"""

import argparse
import glob
import os
import random
import shutil


def split_indices(n, ratio):
    bounds = [0]
    for r in ratio:
        bounds.append(bounds[-1] + int(r * n))
    bounds[-1] = n
    return bounds


def prep(infolder, outfolder, ratio=(0.85, 0.1, 0.05), move=False, seed=0):
    random.seed(seed)
    sections = ("train", "val", "test")
    for s in sections:
        os.makedirs(os.path.join(outfolder, s), exist_ok=True)

    counts = {s: 0 for s in sections}
    class_folders = [cf for cf in glob.glob(os.path.join(infolder, "*"))
                     if os.path.isdir(cf)]
    for cf in sorted(class_folders):
        pcd_files = glob.glob(os.path.join(cf, "clouds", "*.pcd"))
        random.shuffle(pcd_files)
        bounds = split_indices(len(pcd_files), ratio)
        cls = os.path.basename(cf.rstrip("/"))
        for i, s in enumerate(sections):
            for fp in pcd_files[bounds[i]:bounds[i + 1]]:
                dst = os.path.join(outfolder, s,
                                   f"{cls}_{os.path.basename(fp)}")
                (shutil.move if move else shutil.copy)(fp, dst)
                counts[s] += 1
    return counts


def main():
    ap = argparse.ArgumentParser(description="Process ycb")
    ap.add_argument("--infolder", default="ycb/")
    ap.add_argument("--outfolder", default="ycb_out/")
    ap.add_argument("--move", action="store_true")
    ap.add_argument("--ratio", nargs="+", type=float,
                    default=[0.85, 0.1, 0.05])
    args = ap.parse_args()
    print(prep(args.infolder, args.outfolder, tuple(args.ratio),
               move=args.move))


if __name__ == "__main__":
    main()
