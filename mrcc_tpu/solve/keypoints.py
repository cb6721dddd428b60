"""Keypoint post-processing: predictions -> keypoints -> 7-DoF pose.

Parity targets:
- ``get_key_point_predictions`` (utils/output.py:81): per-point softmax over
  classes, per-class best point, confidence threshold.
- ``predict_pose_from_kp`` (app/inference_engine.py:384): Kabsch fit of the
  canonical reference keypoints onto the detected ones.
- ``reference_key_points`` constant (inference_engine.py:128-137).

All functions are fixed-shape/jit-safe: instead of ragged "found classes"
lists they return per-class masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.kabsch import kabsch_pose

# inference_engine.py:128-137 — measured canonical 6 keypoints of the EE.
REFERENCE_KEY_POINTS = np.array([
    [0.01982731, 0.08085986, 0.00321919],
    [0.02171595, -0.08986182, 0.00388430],
    [0.01288678, 0.09103118, 0.06127814],
    [0.02079032, -0.09790908, 0.05609143],
    [-0.00185802, 0.04654205, 0.11564558],
    [0.00241113, -0.04262756, 0.11564558],
], dtype=np.float32)

EE_MIN_WIDTH = abs(REFERENCE_KEY_POINTS[0][1] - REFERENCE_KEY_POINTS[1][1]) - 0.02
EE_MIN_HEIGHT = abs(REFERENCE_KEY_POINTS[0][2] - REFERENCE_KEY_POINTS[2][2]) - 0.01


def key_point_predictions(logits, mask, conf_threshold=0.75):
    """Select the best point per keypoint class above a confidence threshold.

    Args:
      logits: [P, K] per-point keypoint logits.
      mask: [P] point validity.
      conf_threshold: softmax confidence cutoff (INFERENCE.KEY_POINTS
        .conf_threshold = 0.75).

    Returns (idx [K], found [K], conf [K]): per class, the argmax point
    index, whether it clears the threshold, and its confidence.
    """
    probs = jax.nn.softmax(logits, axis=-1)          # softmax over classes
    probs = jnp.where(mask[:, None], probs, -1.0)    # exclude padding points
    conf = probs.max(axis=0)                          # [K]
    idx = probs.argmax(axis=0).astype(jnp.int32)      # [K]
    found = conf > conf_threshold
    return idx, found, conf


def pose_from_key_points(kp_coords, found, reference=None, min_count=4):
    """Kabsch solve of canonical keypoints onto detections.

    Args:
      kp_coords: [K, 3] detected keypoint coordinates (garbage where not
        found — they are masked out by ``found``).
      found: [K] bool.
      min_count: minimum detections for a valid solve
        (inference_engine.py:385: ``len(kp_classes) < 4 -> None``).

    Returns (pose [7], ok scalar bool).
    """
    ref = jnp.asarray(REFERENCE_KEY_POINTS if reference is None else reference,
                      dtype=kp_coords.dtype)
    w = found.astype(kp_coords.dtype)
    ok = jnp.sum(found) >= min_count
    # degenerate guard: with <3 points Kabsch is underdetermined; weights
    # fall back to uniform so the SVD stays finite, result gated by ``ok``.
    w_safe = jnp.where(jnp.sum(found) >= 3, w, jnp.ones_like(w))
    pose = kabsch_pose(ref, kp_coords, weights=w_safe)
    return pose, ok
