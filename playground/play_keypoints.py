"""Explore the keypoint template geometry and Kabsch pose-from-keypoints.

Counterpart of /root/reference/playground/play_keypoints.py (label the 6-
and 10-keypoint templates on an EE crop, visualize, recover the pose).
Generates a synthetic EE crop at a random pose, extracts the 6-keypoint
labels exactly as the dataloader does (data/labels.py:190), then recovers
the pose from the labeled keypoints with the engine's Kabsch solver and
reports the round-trip error — the noise-free upper bound of the
keypoint pipeline.

  python playground/play_keypoints.py [--n 2048] [--snapshot kp.png]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from mrcc_tpu.data.labels import get_6_key_points  # noqa: E402
from mrcc_tpu.data.synthetic import generate_sample  # noqa: E402
from mrcc_tpu.geometry.transform import quat_to_matrix  # noqa: E402
from mrcc_tpu.solve.keypoints import pose_from_key_points  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--snapshot", default=None)
    args = ap.parse_args()

    s = generate_sample(seed=args.seed)
    ee = s["labels"] == 2
    ee_pts = s["points"][ee]
    pose = np.asarray(s["pose"], np.float32)
    print(f"EE crop: {len(ee_pts)} points | GT pose {np.round(pose, 3)}")

    kp_xyz, kp_idx = get_6_key_points(ee_pts, pose)
    if len(np.asarray(kp_xyz)) == 0:
        print("EE face not visible from this pose — try another --seed")
        return
    found = np.asarray(kp_idx) >= 0
    print("keypoints found:", int(found.sum()), "of 6 | indices:",
          np.asarray(kp_idx).tolist())

    rec, ok = pose_from_key_points(
        jnp.asarray(np.asarray(kp_xyz, np.float32)), jnp.asarray(found))
    rec = np.asarray(rec)
    print("Kabsch ok:", bool(ok))
    t_err = float(np.linalg.norm(rec[:3] - pose[:3]))
    r_gt = np.asarray(quat_to_matrix(jnp.asarray(pose[3:])))
    r_rec = np.asarray(quat_to_matrix(jnp.asarray(rec[3:])))
    cos = (np.trace(r_gt.T @ r_rec) - 1) / 2
    r_err = float(np.arccos(np.clip(cos, -1, 1)))
    print(f"Kabsch round-trip: translation {t_err * 100:.2f} cm, "
          f"rotation {np.degrees(r_err):.2f} deg")

    if args.snapshot:
        from mrcc_tpu.utils.visualization import save_cloud_png

        colors = np.full_like(ee_pts, 0.75)
        for j, i in enumerate(np.asarray(kp_idx)):
            if i >= 0:
                colors[int(i)] = [1.0, j / 6.0, 0.0]
        save_cloud_png(ee_pts, colors, args.snapshot, s=3.0)
        print("snapshot:", args.snapshot)


if __name__ == "__main__":
    main()
