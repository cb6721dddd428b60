"""Build a split JSON for the flat alivev1 layout.

Parity: /root/reference/scripts/alivev1_splitter.py — v1 data lives as
``<infolder>/{train,val,test}/<position>_<light>_*.pickle`` (already split
by folder); the splitter collects the files, skips ``*_semantic.pickle``
companions and dark-light captures, and records position/light metadata
parsed from the filename.

  python scripts/alivev1_splitter.py --infolder alivev1/ --out v1_splits.json
"""

import argparse
import glob
import json
import os


def create_info(filepath):
    parts = os.path.basename(filepath).split("_")
    return {
        "filepath": filepath,
        "position": parts[0],
        "light": parts[1] if len(parts) > 1 else "",
    }


def build_splits(infolder, include_dark=False):
    out = {}
    for section in ("train", "val", "test"):
        pickles = glob.glob(os.path.join(infolder, section, "*.pickle"))
        pickles = [p for p in pickles
                   if not p.endswith("_semantic.pickle")
                   and (include_dark or "dark" not in p)]
        out[section] = [create_info(p) for p in sorted(pickles)]
    return out


def main():
    ap = argparse.ArgumentParser(description="Split alivev1")
    ap.add_argument("--infolder", default="alivev1/")
    ap.add_argument("--out", default="alivev1_splits.json")
    ap.add_argument("--include-dark", action="store_true")
    args = ap.parse_args()

    splits = build_splits(args.infolder, include_dark=args.include_dark)
    with open(args.out, "w") as fp:
        json.dump(splits, fp, indent=2)
    print({k: len(v) for k, v in splits.items()})


if __name__ == "__main__":
    main()
