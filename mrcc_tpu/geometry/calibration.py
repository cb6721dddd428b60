"""Pose averaging and outlier detection for extrinsic calibration.

Parity target: /root/reference/utils/calibration.py.  The quaternion average
is the Markley/NASA eigenvector method; since the accumulator A = Σ wᵢ qᵢqᵢᵀ
is symmetric PSD we use ``jnp.linalg.eigh`` (TPU-friendly, real) instead of
the reference's general ``eig``.
"""

from __future__ import annotations

import jax.numpy as jnp

from .metrics import compute_pose_metrics


def mad_outliers(y, m=2.0):
    """Median-absolute-deviation outlier flags (calibration.py:15).

    Returns a boolean mask of outliers.  When the MAD is zero the reference
    sets the score to scalar 0 (no outliers); we reproduce that.
    """
    y = jnp.asarray(y)
    d = jnp.abs(y - jnp.median(y))
    mdev = jnp.median(d)
    s = jnp.where(mdev > 0, d / jnp.maximum(mdev, 1e-30), jnp.zeros_like(d))
    return s > m


def pose_outliers(poses, m_pos=2.0, m_ang=4.0):
    """Outlier flags over a stack of poses (calibration.py:34).

    A pose is an outlier if any of x/y/z is a MAD outlier, or (for 7-dim
    poses) its angle to the identity quaternion is a MAD outlier at m=4.
    """
    poses = jnp.asarray(poses)
    out = jnp.zeros(poses.shape[0], dtype=bool)
    for i in range(3):
        out = jnp.logical_or(out, mad_outliers(poses[:, i], m=m_pos))
    if poses.shape[1] == 7:
        ref = jnp.asarray([0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0], dtype=poses.dtype)
        angles = jnp.stack(
            [compute_pose_metrics(ref, poses[i])["angle_diff"] for i in range(poses.shape[0])]
        )
        out = jnp.logical_or(out, mad_outliers(angles, m=m_ang))
    return out


def remove_pose_outliers(poses):
    """Faithful no-op: the reference computes outliers then returns the input
    unchanged (calibration.py:55-61, filtering commented out).  Kept as the
    default so calibration numbers match; use ``pose_outliers`` + masking to
    actually filter.
    """
    return poses


def average_quaternions(quats, weights=None):
    """Weighted quaternion average via the largest eigenvector of Σ w qqᵀ.

    Parity: calibration.py:69 (Markley et al., NASA NTRS 20070017872).
    quats: (N, 4) WXYZ.  Sign of the result may be flipped (q ≡ -q).
    """
    quats = jnp.asarray(quats)
    if weights is None:
        weights = jnp.ones(quats.shape[0], dtype=quats.dtype)
    weights = jnp.asarray(weights, dtype=quats.dtype)
    a = jnp.einsum("n,ni,nj->ij", weights, quats, quats) / jnp.maximum(
        jnp.sum(weights), 1e-12
    )
    _, vecs = jnp.linalg.eigh(a)  # ascending eigenvalues
    return vecs[:, -1]


def average_translations(ts, weights=None):
    """Weighted mean of translations (calibration.py:108)."""
    ts = jnp.asarray(ts)
    if weights is None:
        weights = jnp.ones(ts.shape[0], dtype=ts.dtype)
    weights = jnp.asarray(weights, dtype=ts.dtype)
    return jnp.sum(ts * weights[:, None], axis=0) / jnp.maximum(jnp.sum(weights), 1e-12)


def average_poses(poses, weights=None):
    """Average a stack of poses: mean translation + eigen-averaged quaternion.

    Parity: calibration.py:117.  For a single pose returns it unchanged.
    """
    poses = jnp.asarray(poses)
    poses = poses.reshape(-1, 7)
    if poses.shape[0] == 1:
        return poses[0]
    if weights is not None and len(weights) != poses.shape[0]:
        weights = None
    t = average_translations(poses[:, :3], weights)
    q = average_quaternions(poses[:, 3:], weights)
    return jnp.concatenate([t, q], axis=-1)
