#!/usr/bin/env python3
"""Generate a synthetic labelled sample set + split JSON.

Tooling parity: the reference's scripts/ data-prep utilities
(alivev2_splitter.py, edit_splits.py) assume an external recorded dataset;
this generator produces the self-contained equivalent (schema-identical
pickles, README.md:53-62).

Usage: python scripts/generate_dataset.py --out dataset/synthetic --n 20
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="dataset/synthetic")
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--n_ee", type=int, default=4096)
    ap.add_argument("--n_arm", type=int, default=6000)
    ap.add_argument("--n_bg", type=int, default=14000)
    args = ap.parse_args()

    from mrcc_tpu.data.synthetic import write_sample_set

    splits = write_sample_set(args.out, n=args.n, seed0=args.seed,
                              n_ee=args.n_ee, n_arm=args.n_arm,
                              n_bg=args.n_bg)
    print(f"wrote {args.n} samples to {args.out} "
          f"(train/val/test: {len(splits['train'])}/{len(splits['val'])}/"
          f"{len(splits['test'])})")


if __name__ == "__main__":
    main()
