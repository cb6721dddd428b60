"""Generate XYZRGB point clouds from the YCB turntable RGB-D dataset.

Parity: /root/reference/scripts/ycb_generate_point_cloud.py (445 LoC of
per-pixel loops) on the vectorized mrcc_tpu.data.rgbd pipeline.  Expects
the standard YCB layout:

  <ycb>/<object>/{NP1..NP5}_<angle>.jpg                (RGB)
  <ycb>/<object>/{NP1..NP5}_<angle>.h5                 (depth)
  <ycb>/<object>/calibration.h5                        (K matrices + H)
  <ycb>/<object>/masks/{NP}_{angle}_mask.pbm           (optional)

Usage: python scripts/ycb_generate_point_cloud.py <ycb_folder> [objects...]
Requires h5py + imageio (gated; absent from the TPU image by default).
"""

import os
import sys

import numpy as np

from mrcc_tpu.data.rgbd import (
    depth_to_cloud,
    filter_discontinuities,
    register_depth_map,
    write_ply,
)

VIEWPOINT_CAMERAS = ["NP1", "NP2", "NP3", "NP4", "NP5"]
VIEWPOINT_ANGLES = [str(i) for i in range(0, 360, 3)]


def process_view(folder, target, cam, angle, filter_depth=True):
    import h5py
    from imageio import imread

    base = os.path.join(folder, target)
    depth_path = os.path.join(base, f"{cam}_{angle}.h5")
    rgb_path = os.path.join(base, f"{cam}_{angle}.jpg")
    calib_path = os.path.join(base, "calibration.h5")
    if not (os.path.isfile(depth_path) and os.path.isfile(rgb_path)):
        return None

    rgb = np.asarray(imread(rgb_path))
    with h5py.File(depth_path, "r") as f:
        depth = np.asarray(f["depth"])
    with h5py.File(calib_path, "r") as cal:
        depth_k = np.asarray(cal[f"{cam}_depth_K"])
        rgb_k = np.asarray(cal[f"{cam}_rgb_K"])
        d_scale = np.asarray(cal[f"{cam}_ir_depth_scale"]) * 1e-4
        h_rgb_from_ref = np.asarray(cal[f"H_{cam}_from_NP5"])
        h_ir_from_ref = np.asarray(cal[f"H_{cam}_ir_from_NP5"])
    h_rgb_from_depth = h_rgb_from_ref @ np.linalg.inv(h_ir_from_ref)

    if filter_depth:
        depth = filter_discontinuities(depth)
    registered = register_depth_map(depth * d_scale, rgb.shape, depth_k,
                                    rgb_k, h_rgb_from_depth)
    cloud = depth_to_cloud(registered, rgb, rgb_k, organized=False)
    out = os.path.join(base, "clouds")
    os.makedirs(out, exist_ok=True)
    return write_ply(os.path.join(out, f"pc_{cam}_{angle}.ply"), cloud)


def main():
    folder = sys.argv[1]
    targets = sys.argv[2:] or sorted(
        d for d in os.listdir(folder)
        if os.path.isdir(os.path.join(folder, d)))
    try:
        import h5py  # noqa: F401
        from imageio import imread  # noqa: F401
    except ImportError as e:
        print(f"missing dependency: {e} (install h5py + imageio)")
        sys.exit(1)
    done = 0
    for target in targets:
        for cam in VIEWPOINT_CAMERAS:
            for angle in VIEWPOINT_ANGLES:
                if process_view(folder, target, cam, angle):
                    done += 1
        print(f"{target}: {done} views so far")


if __name__ == "__main__":
    main()
