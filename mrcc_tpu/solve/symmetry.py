"""Test-time gripper-symmetry flip disambiguation (ROADMAP r5 #2).

The two-finger gripper is nearly invariant under a 180° rotation about its
approach (z) axis — the canonical keypoint template (data/labels.py:28-36)
maps onto itself with the ±y finger pairs swapped.  The rotation REGRESSOR
therefore has a symmetric error mode: it picks the wrong branch on ~the
tail of held-out crops (r4: max 0.55 rad while the median is 0.169).

The keypoint head does NOT share the ambiguity: its classes are distinct
("top left" vs "top right"), so the Kabsch pose from class-matched
keypoints (solve/keypoints.py) identifies the branch.  When the flipped
candidate is closer to the keypoint pose, take it — and recompute the
"magic" translation under the flipped frame (the x-offset changes sign
with the frame).

This is an engine-level, opt-in correction
(``InferenceConfig.rot_flip_disambiguation``); the reference has no
equivalent (its rotation errors pass through to the calibration average,
app/inference_engine.py:281-382).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.quaternion import qmul
from .translation import predict_translation

# WXYZ quaternions for a 180° body-frame rotation about each axis.
_FLIP_Q = {
    "x": (0.0, 1.0, 0.0, 0.0),
    "y": (0.0, 0.0, 1.0, 0.0),
    "z": (0.0, 0.0, 0.0, 1.0),
}


def _quat_angle(a, b):
    """Rotation angle between unit quaternions (sign-invariant):
    acos(2<a,b>^2 - 1) — the reference's metric form (utils/metrics.py)."""
    a = a / jnp.maximum(jnp.linalg.norm(a), 1e-12)
    b = b / jnp.maximum(jnp.linalg.norm(b), 1e-12)
    d = jnp.sum(a * b)
    return jnp.arccos(jnp.clip(2.0 * d * d - 1.0, -1.0, 1.0))


def disambiguate_flip(ee_pose, kp_pose, kp_ok, ee_points, mask,
                      axis="z", magic_x=-0.015, z_percentile=None):
    """Resolve the gripper-symmetry branch of a NN pose via the kp pose.

    Args:
      ee_pose: [7] WXYZ NN pose (pos + quat).
      kp_pose: [7] keypoint Kabsch pose.
      kp_ok: scalar bool — whether the kp pose is trustworthy.
      ee_points/mask: the EE crop ([P, 3], [P]) for re-running the magic
        translation under the flipped orientation.
      axis: body-frame symmetry axis ('z' for the canonical template).

    Returns ([7] pose, scalar bool flipped).
    """
    q = ee_pose[3:7]
    q_flip = qmul(q, jnp.asarray(_FLIP_Q[axis], q.dtype))
    q_kp = kp_pose[3:7]
    use = kp_ok & (_quat_angle(q_flip, q_kp) < _quat_angle(q, q_kp))
    pos_flip, _ = predict_translation(ee_points, mask, q_flip,
                                      magic_x=magic_x,
                                      z_percentile=z_percentile)
    pos = jnp.where(use, pos_flip, ee_pose[:3])
    q_out = jnp.where(use, q_flip, q)
    return jnp.concatenate([pos, q_out]), use
