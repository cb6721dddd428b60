"""SE(3) pose / rotation-matrix utilities in JAX.

Poses are 7-vectors ``[x, y, z, qw, qx, qy, qz]`` (WXYZ), matching the
reference's internal convention after load (utils/transformation.py).  All
functions broadcast over leading batch dims and are jit/vmap-safe.

Parity target: /root/reference/utils/transformation.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quaternion import qnormalize


def quat_to_matrix(q, normalize=True):
    """WXYZ quaternion(s) -> rotation matrix/matrices (..., 3, 3).

    With ``normalize=True`` this matches the pytorch3d formula used by the
    reference (transformation.py:104, ``get_quaternion_rotation_matrix_torch``)
    for arbitrary-norm quaternions; for unit quaternions it also matches the
    numpy version (transformation.py:16).
    """
    q = jnp.asarray(q)
    if normalize:
        q = qnormalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    rows = jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def matrix_to_quat(m):
    """Rotation matrix/matrices -> WXYZ quaternion(s); branchless Shepperd.

    Jit-safe closed form replacing the reference's scipy
    ``Rotation.from_matrix`` (transformation.py:80).  Output sign follows the
    largest-magnitude component (equal to scipy's up to global sign; all
    downstream consumers are sign-invariant).
    """
    m = jnp.asarray(m)
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four candidate quaternions, one per dominant diagonal term.
    # Each is 4*qi * q (unnormalized); pick the one with the largest pivot.
    tr = m00 + m11 + m22
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    pivots = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                        1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    best = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1), axis=-2)
    q = q[..., 0, :]
    return qnormalize(q)


def rot6d_to_matrix(r6):
    """Continuous 6D rotation parameterization -> rotation matrix.

    Gram-Schmidt on the two predicted column vectors (Zhou et al., "On the
    Continuity of Rotation Representations in Neural Networks"): unlike
    quaternions, the map from R^6 is continuous, which helps regression
    heads (ROADMAP #8 opt-in; the reference trains quaternions, loss.py:74).

    r6: (..., 6) -> (..., 3, 3) with columns [b1 b2 b3], det = +1.
    """
    r6 = jnp.asarray(r6)
    a1, a2 = r6[..., :3], r6[..., 3:6]
    eps = 1e-8
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), eps)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), eps)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rot6d_to_quat(r6):
    """6D rotation -> WXYZ quaternion (via :func:`rot6d_to_matrix`)."""
    return matrix_to_quat(rot6d_to_matrix(r6))


def pose_to_matrix(pose):
    """Pose [x,y,z,qw,qx,qy,qz] -> 4x4 homogeneous transform.

    Parity: transformation.py:63 ``get_transformation_matrix``.
    """
    pose = jnp.asarray(pose)
    rot = quat_to_matrix(pose[..., 3:7])
    t = pose[..., :3]
    top = jnp.concatenate([rot, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def matrix_to_pose(mat):
    """4x4 transform -> pose [x,y,z,qw,qx,qy,qz] (transformation.py:87)."""
    mat = jnp.asarray(mat)
    t = mat[..., :3, 3]
    q = matrix_to_quat(mat[..., :3, :3])
    return jnp.concatenate([t, q], axis=-1)


def matrix_inverse_rigid(mat):
    """Inverse of a rigid 4x4 transform via transpose (transformation.py:71)."""
    mat = jnp.asarray(mat)
    rt = jnp.swapaxes(mat[..., :3, :3], -1, -2)
    t = -jnp.einsum("...ij,...j->...i", rt, mat[..., :3, 3])
    top = jnp.concatenate([rt, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def pose_inverse(pose):
    """Inverse pose (transformation.py:96)."""
    return matrix_to_pose(matrix_inverse_rigid(pose_to_matrix(pose)))


def base2cam_matrix(ee2cam_pose, ee2robot_pose):
    """robot-base -> camera 4x4 transform (transformation.py:225).

    ``robot2cam = ee2cam @ inv(ee2robot)``.
    """
    ee2cam = pose_to_matrix(ee2cam_pose)
    robot2ee = matrix_inverse_rigid(pose_to_matrix(ee2robot_pose))
    return ee2cam @ robot2ee


def base2cam_pose(ee2cam_pose, ee2robot_pose):
    """robot-base -> camera pose (transformation.py:240)."""
    return matrix_to_pose(base2cam_matrix(ee2cam_pose, ee2robot_pose))


def transform_pose2pose(pose1, pose2):
    """Compose two poses: matrix(pose1) @ matrix(pose2) (transformation.py:259)."""
    return matrix_to_pose(pose_to_matrix(pose1) @ pose_to_matrix(pose2))


def transform_points(pose, points):
    """Apply pose to (..., N, 3) points: R @ p + t."""
    pose = jnp.asarray(pose)
    rot = quat_to_matrix(pose[..., 3:7])
    return jnp.einsum("...ij,...nj->...ni", rot, points) + pose[..., None, :3]


def inverse_transform_points(pose, points):
    """Map points from world frame into the pose's local frame: Rᵀ (p - t)."""
    pose = jnp.asarray(pose)
    rot = quat_to_matrix(pose[..., 3:7])
    return jnp.einsum("...ji,...nj->...ni", rot, points - pose[..., None, :3])


def dists_to_line(p, lp1, lp2):
    """Perpendicular distances of points (..., N, 3) to the line lp1-lp2.

    Parity: transformation.py:138 ``compute_dists_to_line``.
    """
    p = jnp.asarray(p)
    lp1 = jnp.asarray(lp1)
    lp2 = jnp.asarray(lp2)
    d = (lp1 - lp2) / jnp.linalg.norm(lp1 - lp2, axis=-1, keepdims=True)
    v = p - lp1
    t = jnp.sum(v * d, axis=-1, keepdims=True)
    proj = lp1 + t * d
    return jnp.linalg.norm(proj - p, axis=-1)
