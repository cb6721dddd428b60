"""Quaternion algebra in JAX (WXYZ convention, scalar first).

The framework uses WXYZ everywhere internally; dataset pickles store XYZW and
are converted once at load (reference: data/alivev2.py:124 does the same via
``np.insert``).  Parity targets: utils/quaternion.py (QuaterNet port) and
utils/transformation.py in the reference.

All functions are pure, broadcast over leading dims, and safe under jit/vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8


def xyzw_to_wxyz(q):
    """Reorder an XYZW quaternion (or trailing-dim-4 stack) to WXYZ."""
    q = jnp.asarray(q)
    return jnp.concatenate([q[..., 3:4], q[..., :3]], axis=-1)


def wxyz_to_xyzw(q):
    """Reorder a WXYZ quaternion (or trailing-dim-4 stack) to XYZW."""
    q = jnp.asarray(q)
    return jnp.concatenate([q[..., 1:4], q[..., 0:1]], axis=-1)


def switch_pose_w(pose):
    """[x,y,z,qx,qy,qz,qw] -> [x,y,z,qw,qx,qy,qz] (reference transformation.py:7)."""
    pose = jnp.asarray(pose)
    return jnp.concatenate([pose[..., :3], xyzw_to_wxyz(pose[..., 3:7])], axis=-1)


def qnormalize(q, eps=EPS):
    """Normalize to a unit quaternion."""
    q = jnp.asarray(q)
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def qconj(q):
    """Quaternion conjugate (reference quaternion.py:102 qconj_np)."""
    q = jnp.asarray(q)
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qmul(q, r):
    """Hamilton product q*r for WXYZ quaternions, broadcasting over leading dims.

    Matches reference utils/quaternion.py:14 (QuaterNet qmul).
    """
    q = jnp.asarray(q)
    r = jnp.asarray(r)
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rw, rx, ry, rz = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    w = qw * rw - qx * rx - qy * ry - qz * rz
    x = qw * rx + qx * rw + qy * rz - qz * ry
    y = qw * ry - qx * rz + qy * rw + qz * rx
    z = qw * rz + qx * ry - qy * rx + qz * rw
    return jnp.stack([w, x, y, z], axis=-1)


def qrot(q, v):
    """Rotate vectors v by WXYZ quaternions q (broadcasting over leading dims).

    Matches reference utils/quaternion.py:34 (QuaterNet qrot): assumes unit q.
    """
    q = jnp.asarray(q)
    v = jnp.asarray(v)
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def qeuler(q, order="zyx", epsilon=0.0):
    """Quaternion (WXYZ) to Euler angles for the 6 axis orders.

    Matches reference utils/quaternion.py:54 exactly (same formulas per order).
    """
    q = jnp.asarray(q)
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]

    def asin_c(x):
        return jnp.arcsin(jnp.clip(x, -1.0 + epsilon, 1.0 - epsilon))

    if order == "xyz":
        x = jnp.arctan2(2 * (q0 * q1 - q2 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        y = asin_c(2 * (q1 * q3 + q0 * q2))
        z = jnp.arctan2(2 * (q0 * q3 - q1 * q2), 1 - 2 * (q2 * q2 + q3 * q3))
    elif order == "yzx":
        x = jnp.arctan2(2 * (q0 * q1 - q2 * q3), 1 - 2 * (q1 * q1 + q3 * q3))
        y = jnp.arctan2(2 * (q0 * q2 - q1 * q3), 1 - 2 * (q2 * q2 + q3 * q3))
        z = asin_c(2 * (q1 * q2 + q0 * q3))
    elif order == "zxy":
        x = asin_c(2 * (q0 * q1 + q2 * q3))
        y = jnp.arctan2(2 * (q0 * q2 - q1 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        z = jnp.arctan2(2 * (q0 * q3 - q1 * q2), 1 - 2 * (q1 * q1 + q3 * q3))
    elif order == "xzy":
        x = jnp.arctan2(2 * (q0 * q1 + q2 * q3), 1 - 2 * (q1 * q1 + q3 * q3))
        y = jnp.arctan2(2 * (q0 * q2 + q1 * q3), 1 - 2 * (q2 * q2 + q3 * q3))
        z = asin_c(2 * (q0 * q3 - q1 * q2))
    elif order == "yxz":
        x = asin_c(2 * (q0 * q1 - q2 * q3))
        y = jnp.arctan2(2 * (q1 * q3 + q0 * q2), 1 - 2 * (q1 * q1 + q2 * q2))
        z = jnp.arctan2(2 * (q1 * q2 + q0 * q3), 1 - 2 * (q1 * q1 + q3 * q3))
    elif order == "zyx":
        x = jnp.arctan2(2 * (q0 * q1 + q2 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        y = asin_c(2 * (q0 * q2 - q1 * q3))
        z = jnp.arctan2(2 * (q0 * q3 + q1 * q2), 1 - 2 * (q2 * q2 + q3 * q3))
    else:
        raise ValueError(f"unknown euler order: {order}")

    return jnp.stack([x, y, z], axis=-1)


def qfix(q):
    """Enforce sign continuity along the leading (time) axis.

    Matches reference utils/quaternion.py:124 for input shape (L, J, 4).
    """
    q = jnp.asarray(q)
    dots = jnp.sum(q[1:] * q[:-1], axis=-1)
    flip = jnp.cumsum(dots < 0, axis=0) % 2
    sign = jnp.where(flip.astype(bool), -1.0, 1.0)[..., None]
    return jnp.concatenate([q[:1], q[1:] * sign], axis=0)


def expmap_to_quat(e):
    """Axis-angle (exponential map) to WXYZ quaternion.

    Matches reference utils/quaternion.py:144 (stable sinc formula).
    """
    e = jnp.asarray(e)
    theta = jnp.linalg.norm(e, axis=-1, keepdims=True)
    w = jnp.cos(0.5 * theta)
    xyz = 0.5 * jnp.sinc(0.5 * theta / jnp.pi) * e
    return jnp.concatenate([w, xyz], axis=-1)


def euler_to_quat(e, order="xyz"):
    """Euler angles to WXYZ quaternion.

    Matches reference utils/quaternion.py:163, including the antipodal sign
    flip for right-handed orders.
    """
    e = jnp.asarray(e)
    x, y, z = e[..., 0], e[..., 1], e[..., 2]
    zeros = jnp.zeros_like(x)
    rx = jnp.stack([jnp.cos(x / 2), jnp.sin(x / 2), zeros, zeros], axis=-1)
    ry = jnp.stack([jnp.cos(y / 2), zeros, jnp.sin(y / 2), zeros], axis=-1)
    rz = jnp.stack([jnp.cos(z / 2), zeros, zeros, jnp.sin(z / 2)], axis=-1)
    table = {"x": rx, "y": ry, "z": rz}
    result = None
    for axis in order:
        r = table[axis]
        result = r if result is None else qmul(result, r)
    if order in ("xyz", "yzx", "zxy"):
        result = -result
    return result


def qangle(q1, q2):
    """Absolute angle (rad) between two WXYZ quaternions; sign-invariant.

    Same quantity the reference computes via
    ``acos(2*<q1,q2>^2 - 1)`` (utils/metrics.py:37) but in the numerically
    safer atan2 form used by utils/metrics.py:121; equal for unit inputs.
    """
    qd = qmul(qnormalize(q1), qconj(qnormalize(q2)))
    ang = 2.0 * jnp.arctan2(jnp.linalg.norm(qd[..., 1:], axis=-1), jnp.abs(qd[..., 0]))
    return ang
