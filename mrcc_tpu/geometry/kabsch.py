"""Kabsch rigid alignment (SVD) with reflection fix, masked and batched.

Parity target: /root/reference/utils/transformation.py:178
(``get_rigid_transform_3D``).  The reference operates on exact-size numpy
arrays; here we additionally support a validity mask so the solve can run on
fixed-capacity padded buffers inside jit, and a weighted variant for
probability-weighted keypoints.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .transform import matrix_to_quat


def kabsch(reference, target, weights=None):
    """Least-squares rigid transform mapping ``reference`` onto ``target``.

    Args:
      reference: (..., N, 3) source points.
      target:    (..., N, 3) destination points.
      weights:   optional (..., N) non-negative weights; use 0 to mask out
                 padded rows (enables fixed-shape jit).

    Returns:
      (R, t): rotation (..., 3, 3) and translation (..., 3) such that
      ``R @ reference + t ≈ target`` — same contract as the reference
      implementation, including the det<0 reflection correction
      (transformation.py:215).
    """
    reference = jnp.asarray(reference)
    target = jnp.asarray(target)
    if weights is None:
        weights = jnp.ones(reference.shape[:-1], dtype=reference.dtype)
    weights = jnp.asarray(weights, dtype=reference.dtype)
    wsum = jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-12)
    w = (weights / wsum)[..., None]

    centroid_a = jnp.sum(reference * w, axis=-2, keepdims=True)
    centroid_b = jnp.sum(target * w, axis=-2, keepdims=True)
    am = reference - centroid_a
    bm = target - centroid_b

    # H = Amᵀ W Bm  (3x3 cross-covariance)
    h = jnp.einsum("...ni,...nj->...ij", am * w, bm)

    u, s, vt = jnp.linalg.svd(h, full_matrices=False)
    v = jnp.swapaxes(vt, -1, -2)
    ut = jnp.swapaxes(u, -1, -2)
    r = v @ ut
    # Reflection fix: flip last row of Vᵀ when det(R) < 0.
    det = jnp.linalg.det(r)
    flip = jnp.where(det < 0, -1.0, 1.0)
    v_fixed = v.at[..., :, 2].multiply(flip[..., None])
    r = v_fixed @ ut

    t = centroid_b[..., 0, :] - jnp.einsum("...ij,...j->...i", r, centroid_a[..., 0, :])
    return r, t


def kabsch_pose(reference, target, weights=None):
    """Kabsch solve returning a 7-vector pose [x,y,z,qw,qx,qy,qz].

    Mirrors InferenceEngine.predict_pose_from_kp (inference_engine.py:384):
    rigid fit of canonical keypoints onto detected keypoints, quaternion from
    the rotation matrix.
    """
    r, t = kabsch(reference, target, weights=weights)
    q = matrix_to_quat(r)
    return jnp.concatenate([t, q], axis=-1)
