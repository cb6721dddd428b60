"""EE-crop -> template ICP: recovery error vs initial pose error.

Counterpart of /root/reference/playground/play_ee_icp.py (noisy EE crop
registered to the CAD cross-section with Open3D ICP).  Synthesizes an EE
crop at a known pose, perturbs the pose estimate by growing amounts, and
measures how much of the error the jit'd trimmed ICP (solve/icp.py:66)
pulls back — the basin-of-attraction study that motivated the reference's
"NN predicts, ICP refines" split.

  python playground/play_ee_icp.py [--noise 0.003]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from mrcc_tpu.data.synthetic import generate_sample  # noqa: E402
from mrcc_tpu.geometry.transform import quat_to_matrix  # noqa: E402
from mrcc_tpu.solve.icp import default_template, icp_refine  # noqa: E402


def quat_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2], np.float32)


def axis_angle_quat(angle, axis, rng):
    axis = rng.normal(size=3) if axis is None else np.asarray(axis, float)
    axis = axis / np.linalg.norm(axis)
    return np.array([np.cos(angle / 2), *(np.sin(angle / 2) * axis)],
                    np.float32)


def rot_err_deg(qa, qb):
    ra = np.asarray(quat_to_matrix(jnp.asarray(qa)))
    rb = np.asarray(quat_to_matrix(jnp.asarray(qb)))
    cos = (np.trace(ra.T @ rb) - 1) / 2
    return float(np.degrees(np.arccos(np.clip(cos, -1, 1))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--noise", type=float, default=0.003)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    rng = np.random.default_rng(2)
    s = generate_sample(seed=9)
    ee_mask = s["labels"] == 2
    ee_pts = s["points"][ee_mask] + rng.normal(
        0, args.noise, (int(ee_mask.sum()), 3)).astype(np.float32)
    gt = np.asarray(s["pose"], np.float32)
    template = default_template(1024)
    print(f"EE crop {len(ee_pts)} pts, noise sigma {args.noise} m")

    print(f"{'init rot err':>13} {'init t err':>11} "
          f"{'-> rot err':>11} {'-> t err':>9}")
    for angle_deg in (2, 5, 10, 20, 40):
        for t_off in (0.01, 0.03):
            dq = axis_angle_quat(np.radians(angle_deg), None, rng)
            init = gt.copy()
            init[:3] += rng.normal(0, t_off, 3).astype(np.float32)
            init[3:] = quat_mul(dq, gt[3:])
            refined = np.asarray(icp_refine(
                jnp.asarray(template), jnp.asarray(ee_pts),
                jnp.ones(len(ee_pts), bool), jnp.asarray(init),
                iterations=args.iters))
            print(f"{rot_err_deg(init[3:], gt[3:]):13.2f} "
                  f"{np.linalg.norm(init[:3] - gt[:3]):11.4f} "
                  f"{rot_err_deg(refined[3:], gt[3:]):11.2f} "
                  f"{np.linalg.norm(refined[:3] - gt[:3]):9.4f}")


if __name__ == "__main__":
    main()
