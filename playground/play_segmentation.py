"""Run the segmentation stage alone on one scene and poke the output.

Counterpart of /root/reference/playground/play_segmentation.py (load one
pickle, run the ME backbone, paint the classes).  Loads a recorded pickle
when given a path, else generates a synthetic scene; runs the engine's
seg stage (optionally from a trained checkpoint in exp/segmentation) and
prints per-class counts + writes a painted snapshot PNG.

  python playground/play_segmentation.py [cloud.pickle] [--snapshot seg.png]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mrcc_tpu.app import InferenceConfig, InferenceEngine  # noqa: E402

CLASS_COLORS = np.array([[0.7, 0.7, 0.7],   # background
                         [0.2, 0.4, 1.0],   # arm
                         [1.0, 0.2, 0.2]])  # EE


def load_scene(path):
    if path:
        from mrcc_tpu.data.dataset import load_sample

        data = load_sample(path)
        if isinstance(data, dict):
            return (np.asarray(data["points"], np.float32),
                    np.asarray(data["rgb"], np.float32))
        return np.asarray(data[0], np.float32), np.asarray(data[1], np.float32)
    from mrcc_tpu.data.synthetic import generate_sample

    s = generate_sample(seed=3)
    return s["points"], s["rgb"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", nargs="?", default=None)
    ap.add_argument("--snapshot", default="playground_seg.png")
    ap.add_argument("--checkpoint", default=None,
                    help="flax .ckpt (default: random init — structure only)")
    args = ap.parse_args()

    points, rgb = load_scene(args.path)
    n = len(points)
    cfg = InferenceConfig(point_capacity=1 << int(np.ceil(np.log2(n))),
                          seg_checkpoint=args.checkpoint)
    engine = InferenceEngine(cfg, seed=0)

    pts, rgb_p, mask = engine._pad(points, rgb)
    out = engine.predict_batch_arrays(pts[None], rgb_p[None], mask[None])
    seg = np.asarray(out["segmentation"][0])[: n]

    uniq, counts = np.unique(seg, return_counts=True)
    print("per-class voxel->point counts:",
          {int(u): int(c) for u, c in zip(uniq, counts)})
    print("EE crop size:", int(out["ee_count"][0]),
          "| overflow:", bool(out["seg_overflow"][0]))
    print("NN pose:", np.round(np.asarray(out["ee_pose"][0]), 4).tolist())

    from mrcc_tpu.utils.visualization import save_cloud_png

    painted = CLASS_COLORS[np.clip(seg, 0, 2)]
    save_cloud_png(points, painted, args.snapshot)
    print("snapshot:", args.snapshot)


if __name__ == "__main__":
    main()
