"""Dense point-cloud ops: FPS, ball query, grouping, 3-NN interpolation.

Parity: /root/reference/model/pointnet2_utils.py:21-160 — redesigned for
TPU/XLA: fixed shapes, ``lax.fori_loop`` for the inherently-serial FPS
argmax chain, distance matrices as single MXU matmuls, and the reference's
exact ball-query semantics (first ``nsample`` indices in index order within
the radius, missing slots filled with the first hit).

The dense path operates on exactly-N-point clouds ([B, N, C] channel-last),
matching the reference's contract of sampling ``num_of_dense_input_points``
(2048) before the network (data/alivev2_dense.py:37-56).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def square_distance(src, dst):
    """Pairwise squared distances [B, N, M] (pointnet2_utils.py:21)."""
    s2 = jnp.sum(src**2, axis=-1, keepdims=True)          # [B,N,1]
    d2 = jnp.sum(dst**2, axis=-1)[..., None, :]           # [B,1,M]
    return s2 + d2 - 2.0 * jnp.einsum("bnc,bmc->bnm", src, dst)


def index_points(points, idx):
    """Gather rows: points [B, N, C], idx [B, ...] -> [B, ..., C]
    (pointnet2_utils.py:45)."""
    return jnp.take_along_axis(
        points,
        idx.reshape(idx.shape[0], -1, 1),
        axis=1,
    ).reshape(idx.shape + (points.shape[-1],))


@partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample(xyz, npoint, start_idx=0):
    """FPS indices [B, npoint] (pointnet2_utils.py:65).

    The reference starts from a random index; pass ``start_idx`` (scalar or
    [B]) for seeded variation — default 0 is deterministic.
    """
    b, n, _ = xyz.shape
    start = jnp.broadcast_to(jnp.asarray(start_idx, jnp.int32), (b,))

    def body(i, state):
        dist, farthest, out = state
        out = out.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None].repeat(3, -1),
                                       axis=1)  # [B,1,3]
        d = jnp.sum((xyz - centroid) ** 2, axis=-1)
        dist = jnp.minimum(dist, d)
        return dist, jnp.argmax(dist, axis=-1).astype(jnp.int32), out

    init = (jnp.full((b, n), 1e10, xyz.dtype), start,
            jnp.zeros((b, npoint), jnp.int32))
    _, _, out = jax.lax.fori_loop(0, npoint, body, init)
    return out


@partial(jax.jit, static_argnames=("nsample",))
def query_ball_point(radius, nsample, xyz, new_xyz):
    """Ball query [B, S, nsample] (pointnet2_utils.py:89).

    Exact reference semantics: take the first ``nsample`` point indices (in
    index order) whose distance to the query is < radius; pad missing slots
    with the group's first hit.
    """
    b, n, _ = xyz.shape
    s = new_xyz.shape[1]
    d2 = square_distance(new_xyz, xyz)                    # [B,S,N]
    arange = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, s, n))
    cand = jnp.where(d2 > radius**2, n, arange)
    cand = jnp.sort(cand, axis=-1)[..., :nsample]
    first = cand[..., :1]
    group_idx = jnp.where(cand == n, first, cand)
    # degenerate guard (empty ball): clamp to 0
    return jnp.minimum(group_idx, n - 1)


def sample_and_group(npoint, radius, nsample, xyz, points):
    """FPS + ball query + local-frame concat (pointnet2_utils.py:112).

    Returns (new_xyz [B,S,3], grouped [B,S,K,3+C]).
    """
    fps_idx = farthest_point_sample(xyz, npoint)
    new_xyz = index_points(xyz, fps_idx)
    idx = query_ball_point(radius, nsample, xyz, new_xyz)
    grouped_xyz = index_points(xyz, idx) - new_xyz[:, :, None, :]
    if points is not None:
        grouped = jnp.concatenate([grouped_xyz, index_points(points, idx)],
                                  axis=-1)
    else:
        grouped = grouped_xyz
    return new_xyz, grouped


def sample_and_group_all(xyz, points):
    """Single global group (pointnet2_utils.py:140)."""
    b, n, _ = xyz.shape
    new_xyz = jnp.zeros((b, 1, 3), xyz.dtype)
    grouped_xyz = xyz[:, None, :, :]
    if points is not None:
        grouped = jnp.concatenate([grouped_xyz, points[:, None, :, :]], axis=-1)
    else:
        grouped = grouped_xyz
    return new_xyz, grouped


def three_nn_interpolate(xyz_fine, xyz_coarse, feats_coarse):
    """Inverse-distance weighted 3-NN interpolation
    (pointnet2_utils.py:292-306): [B, N, C] from [B, M, C]."""
    d2 = square_distance(xyz_fine, xyz_coarse)            # [B,N,M]
    neg, idx = jax.lax.top_k(-d2, 3)
    dist = jnp.maximum(-neg, 0.0)
    recip = 1.0 / (dist + 1e-8)
    weight = recip / jnp.sum(recip, axis=-1, keepdims=True)
    gathered = index_points(feats_coarse, idx)            # [B,N,3,C]
    return jnp.sum(gathered * weight[..., None], axis=2)
