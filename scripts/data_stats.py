#!/usr/bin/env python3
"""Dataset statistics (scripts/ data-stats tooling parity).

Prints per-split sample counts, point-count distributions and class balance
for a split JSON.
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("splits", help="split JSON path")
    args = ap.parse_args()

    from mrcc_tpu.data.dataset import load_sample

    with open(args.splits) as f:
        splits = json.load(f)
    for split, entries in splits.items():
        counts = []
        class_counts = np.zeros(3, np.int64)
        for e in entries:
            path = e["filepath"] if isinstance(e, dict) else e
            s = load_sample(path)
            counts.append(len(s["points"]))
            labs = np.asarray(s["labels"]).astype(np.int64)
            class_counts += np.bincount(np.clip(labs, 0, 2), minlength=3)
        if counts:
            print(f"{split}: {len(entries)} samples, "
                  f"points avg={np.mean(counts):.0f} "
                  f"min={np.min(counts)} max={np.max(counts)}, "
                  f"class balance bg/arm/ee = {class_counts.tolist()}")


if __name__ == "__main__":
    main()
