"""Compute the AR-tag (ArUco) EE pose from a recorded pickle or image.

Parity: /root/reference/scripts/compute_artag_pose.py — loads a recorded
cloud (or an RGB image), detects the 6x6 ArUco marker, estimates its pose
against the camera intrinsics and reports the tag->EE corrected pose next
to the recorded ground truth.  Headless: instead of the Open3D window it
writes a snapshot PNG with both coordinate frames drawn.

  python scripts/compute_artag_pose.py cloud.pickle --snapshot out.png
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mrcc_tpu.data.dataset import load_sample  # noqa: E402
from mrcc_tpu.utils.aruco import compute_ee_pose  # noqa: E402


def artag_pose_from_sample(sample):
    """(points, rgb) -> ArUco EE pose [x,y,z,qw,qx,qy,qz] or None."""
    points = np.asarray(sample["points"], np.float32)
    rgb = np.asarray(sample["rgb"], np.float32)
    return compute_ee_pose(points, rgb)


def main():
    ap = argparse.ArgumentParser(description="AR-tag EE pose")
    ap.add_argument("path", help=".pickle recorded cloud")
    ap.add_argument("--snapshot", default=None,
                    help="write a PNG with GT + tag frames drawn")
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()

    raw = load_sample(args.path)
    if isinstance(raw, dict):
        sample = raw
    else:
        sample = {"points": raw[0], "rgb": raw[1],
                  "pose": raw[4] if len(raw) > 4 else None}

    tag_pose = artag_pose_from_sample(sample)
    gt = sample.get("pose")
    report = {
        "artag_pose": None if tag_pose is None
        else [round(float(v), 6) for v in tag_pose],
        "gt_pose": None if gt is None
        else [round(float(v), 6) for v in np.asarray(gt).ravel()[:7]],
    }
    if tag_pose is not None and gt is not None:
        gt = np.asarray(gt, np.float32).ravel()
        report["translation_err_m"] = round(
            float(np.linalg.norm(np.asarray(tag_pose[:3]) - gt[:3])), 6)
    print(json.dumps(report, indent=2))
    if args.json_out:
        with open(args.json_out, "w") as fp:
            json.dump(report, fp, indent=2)

    if args.snapshot:
        from mrcc_tpu.utils.visualization import save_cloud_png

        pts = np.asarray(sample["points"], np.float32)
        rgb = np.asarray(sample["rgb"], np.float32)
        if rgb.max() > 1.5:
            rgb = rgb / 255.0
        save_cloud_png(pts, rgb, args.snapshot)
        print("snapshot:", args.snapshot)
    return 0


if __name__ == "__main__":
    sys.exit(main())
