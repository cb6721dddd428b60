"""Batch-edit split JSON files in place.

Parity: /root/reference/scripts/edit_splits.py (a visit-every-instance
template with an inline "do the thing here" hook).  This version makes the
hook explicit: set/delete a metadata field on every instance dict, or drop
instances failing a predicate, across every ``*splits*.json`` in a folder.

  python scripts/edit_splits.py SPLITS_DIR --set position_eligibility=true
  python scripts/edit_splits.py SPLITS_DIR --delete orientation_eligibility
  python scripts/edit_splits.py SPLITS_DIR --require-min arm_point_count=500
"""

import argparse
import glob
import json
import os


def _parse_value(raw: str):
    try:
        return json.loads(raw)
    except json.JSONDecodeError:
        return raw


def edit_splits(splits, set_kv=None, delete_key=None, require_min=None):
    """Apply the edits; returns (splits, n_edited, n_dropped)."""
    edited = dropped = 0
    for section, instances in splits.items():
        kept = []
        for ins in instances:
            if not isinstance(ins, dict):
                kept.append(ins)
                continue
            if require_min is not None:
                key, lo = require_min
                if float(ins.get(key, 0)) < lo:
                    dropped += 1
                    continue
            if set_kv is not None:
                ins[set_kv[0]] = set_kv[1]
                edited += 1
            if delete_key is not None and delete_key in ins:
                del ins[delete_key]
                edited += 1
            kept.append(ins)
        splits[section] = kept
    return splits, edited, dropped


def main():
    ap = argparse.ArgumentParser(description="Batch-edit split JSONs")
    ap.add_argument("folder")
    ap.add_argument("--set", dest="set_kv", default=None,
                    help="field=value to set on every instance")
    ap.add_argument("--delete", dest="delete_key", default=None)
    ap.add_argument("--require-min", dest="require_min", default=None,
                    help="field=min — drop instances below the threshold")
    args = ap.parse_args()

    set_kv = None
    if args.set_kv:
        k, _, v = args.set_kv.partition("=")
        set_kv = (k, _parse_value(v))
    require_min = None
    if args.require_min:
        k, _, v = args.require_min.partition("=")
        require_min = (k, float(v))

    for sf in sorted(glob.glob(os.path.join(args.folder, "*splits*.json"))):
        with open(sf) as fp:
            splits = json.load(fp)
        splits, edited, dropped = edit_splits(
            splits, set_kv=set_kv, delete_key=args.delete_key,
            require_min=require_min)
        with open(sf, "w") as fp:
            json.dump(splits, fp, indent=4)
        print(f"{sf}: {edited} edits, {dropped} dropped")


if __name__ == "__main__":
    main()
