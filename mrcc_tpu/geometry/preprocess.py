"""Point-cloud preprocessing (centering, color normalization).

Parity target: /root/reference/utils/preprocess.py.  Masked variants support
fixed-capacity padded buffers inside jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def center_at_origin(points, mask=None):
    """Shift so the axis-aligned bbox center sits at the origin.

    Returns ``(points - offset, offset)`` with offset = (max + min) / 2,
    matching preprocess.py:8.  With ``mask``, padded rows are ignored when
    computing the bbox (they are still shifted; mask them downstream).
    """
    points = jnp.asarray(points)
    if mask is None:
        mx = points.max(axis=-2)
        mn = points.min(axis=-2)
    else:
        m = jnp.asarray(mask)[..., None]
        big = jnp.asarray(jnp.finfo(points.dtype).max, dtype=points.dtype)
        mx = jnp.where(m, points, -big).max(axis=-2)
        mn = jnp.where(m, points, big).min(axis=-2)
    offset = (mx + mn) / 2
    return points - offset[..., None, :], offset


def base_at_origin(points, mask=None):
    """Shift so the per-axis minimum sits at the origin (preprocess.py:14)."""
    points = jnp.asarray(points)
    if mask is None:
        mn = points.min(axis=-2)
    else:
        m = jnp.asarray(mask)[..., None]
        big = jnp.asarray(jnp.finfo(points.dtype).max, dtype=points.dtype)
        mn = jnp.where(m, points, big).min(axis=-2)
    return points - mn[..., None, :], mn


def normalize_colors(rgb, mask=None):
    """Normalize RGB features to [-0.5, 0.5] (preprocess.py:20).

    Reproduces the reference's rescue path: if colors exceed 2 they are
    treated as 0-255; if any channel is negative it is min-max rescaled to
    [0, 1] per channel; finally colors in [0, 1] get shifted by -0.5.
    Branches are data-dependent, so this uses jnp.where (jit-safe).
    """
    rgb = jnp.asarray(rgb)
    if mask is None:
        valid = jnp.ones(rgb.shape[:-1], dtype=bool)
    else:
        valid = jnp.asarray(mask)
    v = valid[..., None]

    big = jnp.asarray(1e30, dtype=rgb.dtype)
    vmax_all = jnp.where(v, rgb, -big).max(axis=tuple(range(rgb.ndim - 1)))
    gmax = vmax_all.max()
    rgb = jnp.where(gmax > 2.0, rgb / 255.0, rgb)

    cmin = jnp.where(v, rgb, big).min(axis=-2, keepdims=True)
    cmax = jnp.where(v, rgb, -big).max(axis=-2, keepdims=True)
    gmin = jnp.where(v, rgb, big).min()
    scaled = (rgb - cmin) / jnp.maximum(cmax - cmin, 1e-12)
    rgb = jnp.where(gmin < 0.0, scaled, rgb)

    gmin2 = jnp.where(v, rgb, big).min()
    gmax2 = jnp.where(v, rgb, -big).max()
    in_unit = jnp.logical_and(gmin2 > -1e-6, gmax2 < 1.0 + 1e-6)
    return jnp.where(in_unit, rgb - 0.5, rgb)


def normalize_points(pc, mask=None):
    """Center at mean and scale into the unit sphere (preprocess.py:40, ver=2)."""
    pc = jnp.asarray(pc)
    if mask is None:
        mean = pc.mean(axis=-2, keepdims=True)
        centered = pc - mean
        scale = jnp.max(jnp.linalg.norm(centered, axis=-1), axis=-1)
    else:
        m = jnp.asarray(mask)[..., None].astype(pc.dtype)
        n = jnp.maximum(m.sum(axis=-2, keepdims=True), 1.0)
        mean = (pc * m).sum(axis=-2, keepdims=True) / n
        centered = pc - mean
        scale = jnp.max(jnp.linalg.norm(centered * m, axis=-1), axis=-1)
    return centered / jnp.maximum(scale, 1e-12)[..., None, None]
