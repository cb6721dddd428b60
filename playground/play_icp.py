"""Explore the jit'd trimmed-ICP solver: convergence vs noise and rotation.

Counterpart of /root/reference/playground/play_icp.py (Open3D
registration_icp on a noisy copy of a cloud) — here the solver is the
repo's fixed-iteration brute-force-NN + trimmed-Kabsch (solve/icp.py),
so the whole sweep runs as one jit program.

  python playground/play_icp.py [--iters 30]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from mrcc_tpu.geometry.transform import (  # noqa: E402
    matrix_to_quat, quat_to_matrix)
from mrcc_tpu.solve.icp import default_template, icp_refine  # noqa: E402


def perturbed_pose(angle_rad, axis, t_off):
    axis = np.asarray(axis, np.float32)
    axis /= np.linalg.norm(axis)
    half = angle_rad / 2
    q = np.array([np.cos(half), *(np.sin(half) * axis)], np.float32)
    return np.concatenate([np.asarray(t_off, np.float32), q])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--points", type=int, default=1024)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    template = default_template(args.points)

    print(f"{'noise':>8} {'init rot':>9} {'final rot err':>14} "
          f"{'final trans err':>16}")
    for sigma in (0.0, 0.002, 0.005, 0.01):
        for angle in (0.1, 0.3, 0.6):
            # the observed cloud IS the template + noise, in identity pose;
            # start ICP from a wrong pose and watch it pull back
            obs = np.asarray(template) + rng.normal(
                0, sigma, np.asarray(template).shape).astype(np.float32)
            init = perturbed_pose(angle, rng.normal(size=3), [0.03, -0.02, 0.04])
            refined = np.asarray(icp_refine(
                jnp.asarray(template), jnp.asarray(obs),
                jnp.ones(len(obs), bool), jnp.asarray(init),
                iterations=args.iters))
            r_final = quat_to_matrix(jnp.asarray(refined[3:]))
            # rotation error vs identity
            cos = (np.trace(np.asarray(r_final)) - 1) / 2
            rot_err = float(np.arccos(np.clip(cos, -1, 1)))
            trans_err = float(np.linalg.norm(refined[:3]))
            print(f"{sigma:8.3f} {angle:9.2f} {rot_err:14.4f} "
                  f"{trans_err:16.4f}")
    _ = matrix_to_quat  # (kept imported for interactive fiddling)


if __name__ == "__main__":
    main()
