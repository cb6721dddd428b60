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


def predict_translation(ee_points, mask, q, magic_x=-0.015,
                        z_percentile=None):
    """EE position from points + predicted orientation.

    Args:
      ee_points: [P, 3] EE points (camera frame, padded).
      mask: [P] validity.
      q: [4] WXYZ predicted orientation.
      z_percentile: None preserves the reference's min-z quirk exactly.
        A float p (e.g. 2.0) instead takes the p-th percentile of the
        rotated-frame z values (nearest-rank, masked) — robust to the
        stray mislabeled EE voxels that move a hard min (the dominant
        residual int8-segmentation penalty, RESULTS.md r4; opt-in via
        ``InferenceConfig.translation_z_percentile``).

    Returns ([3] position, [3] origin offset in the rotated frame).
    """
    rot = quat_to_matrix(q)
    local = ee_points @ rot  # rotᵀ p per point
    centered, offset = center_at_origin(local, mask=mask)
    big = jnp.asarray(jnp.finfo(centered.dtype).max, centered.dtype)
    z = jnp.where(mask, centered[:, 2], big)
    if z_percentile is None:
        min_z = z.min()
    else:
        # nearest-rank percentile over the valid count (padding sorts to
        # the tail as +inf); count=0 degenerates to index 0 like min()
        z_sorted = jnp.sort(z)
        cnt = mask.sum()
        j = jnp.clip(jnp.round(z_percentile / 100.0 * (cnt - 1)), 0,
                     z.shape[0] - 1).astype(jnp.int32)
        min_z = z_sorted[j]
    magic = jnp.asarray([magic_x, 0.0, 0.0], centered.dtype).at[2].set(min_z)
    return rot @ (magic + offset), offset
