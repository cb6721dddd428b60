"""Vote-based EE centre prediction.

Parity: ``get_pred_center`` (utils/output.py:45): mean of the coordinates of
the top-8 class-1 logits, plus a ``[-ee_r, 0, 0]`` offset rotated by the
(optionally provided) orientation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.transform import quat_to_matrix


def pred_center(logits, coords, mask, ee_r=0.03, q=None, top_k=8):
    """EE centre from per-point vote logits.

    Args:
      logits: [P, C>=2] vote logits (class 1 = on-axis cross-section).
      coords: [P, 3] point coordinates.
      mask: [P] validity.
      ee_r: radius offset along the gripper axis (PARAM.ee_r; test_vote uses
        0.03 default from output.py:45).
      q: optional [4] WXYZ orientation to rotate the offset with.

    Returns [3] predicted centre.
    """
    score = jnp.where(mask, logits[:, 1], -jnp.inf)
    _, sel = jax.lax.top_k(score, top_k)
    center = coords[sel].mean(axis=0)
    if q is not None:
        rot = quat_to_matrix(q)
        center = center + rot @ jnp.asarray([-ee_r, 0.0, 0.0], coords.dtype)
    return center
