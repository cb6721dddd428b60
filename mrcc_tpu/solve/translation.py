"""Geometric translation estimation (the reference's "magic point").

Parity: InferenceEngine.predict_translation (app/inference_engine.py:459):
no neural network — rotate the EE points into the predicted-orientation
frame, centre them at the bbox origin, take ``[-0.015, 0, min_z]`` plus the
centring offset, rotate back.  (The reference loads a TRANSLATION checkpoint
it never uses; SURVEY.md §2.3.)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.preprocess import center_at_origin
from ..geometry.transform import quat_to_matrix


def predict_translation(ee_points, mask, q, magic_x=-0.015):
    """EE position from points + predicted orientation.

    Args:
      ee_points: [P, 3] EE points (camera frame, padded).
      mask: [P] validity.
      q: [4] WXYZ predicted orientation.

    Returns ([3] position, [3] origin offset in the rotated frame).
    """
    rot = quat_to_matrix(q)
    local = ee_points @ rot  # rotᵀ p per point
    centered, offset = center_at_origin(local, mask=mask)
    big = jnp.asarray(jnp.finfo(centered.dtype).max, centered.dtype)
    min_z = jnp.where(mask, centered[:, 2], big).min()
    magic = jnp.asarray([magic_x, 0.0, 0.0], centered.dtype).at[2].set(min_z)
    return rot @ (magic + offset), offset
