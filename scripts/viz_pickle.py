#!/usr/bin/env python3
"""Render a sample pickle to PNG (visualization/viz_pickle.py equivalent,
headless: seg-color toggle becomes --seg).

Usage: python scripts/viz_pickle.py sample.pickle out.png [--seg]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pickle")
    ap.add_argument("out")
    ap.add_argument("--seg", action="store_true",
                    help="color by segmentation labels instead of RGB")
    args = ap.parse_args()

    from mrcc_tpu.data.dataset import load_sample
    from mrcc_tpu.utils.visualization import SEG_COLORS, save_cloud_png

    s = load_sample(args.pickle)
    pts = np.asarray(s["points"])
    if args.seg:
        colors = SEG_COLORS[np.clip(np.asarray(s["labels"]).astype(int), 0, 2)]
    else:
        rgb = np.asarray(s["rgb"])
        colors = np.clip(rgb if rgb.max() <= 1.5 else rgb / 255.0, 0, 1)
    print(save_cloud_png(pts, colors, args.out))


if __name__ == "__main__":
    main()
