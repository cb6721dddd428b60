"""Batched point-to-point ICP inside jit.

TPU-native replacement for Open3D ``registration_icp`` with
TransformationEstimationPointToPoint (reference utils/icp.py:41-81): refine a
predicted EE pose by registering the CAD hand template onto the observed EE
points.  Instead of a KD-tree + dynamic convergence loop, we run a fixed
number of iterations of (brute-force nearest neighbour -> trimmed Kabsch) —
the distance matrix (template x observed) is a single MXU matmul per
iteration, and fixed shapes keep everything in one compiled program.

The CAD source cloud: the reference poisson-disk-samples 8192 points from
app/hand_files/hand_notblender.obj and masks x>0 (icp.py:26-40).  Those
meshes are LFS-missing; we bake the same geometry from the synthetic EE
template (mrcc_tpu.data.synthetic.ee_template_points) with the same x>0
mask.  ``threshold=0.1`` matches the reference's correspondence cutoff.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.kabsch import kabsch
from ..geometry.transform import matrix_to_pose, pose_to_matrix

_TEMPLATE_CACHE = {}


def default_template(n=2048, seed=7):
    """CAD-replacement template cloud in the canonical EE frame (numpy)."""
    key = (n, seed)
    if key not in _TEMPLATE_CACHE:
        from ..data.synthetic import ee_template_points

        rng = np.random.default_rng(seed)
        pts = ee_template_points(rng, n * 2)
        pts = pts[pts[:, 0] > 0.0]  # the reference's x>0 visibility mask
        if len(pts) >= n:
            pts = pts[:n]
        else:
            reps = int(np.ceil(n / len(pts)))
            pts = np.tile(pts, (reps, 1))[:n]
        _TEMPLATE_CACHE[key] = pts.astype(np.float32)
    return _TEMPLATE_CACHE[key]


def _nn_correspondences(src, target, target_mask):
    """For each src point, nearest valid target point + distance.

    src [M,3], target [N,3], target_mask [N].  Distance matrix via the
    |a-b|^2 = |a|^2 + |b|^2 - 2ab expansion (one MXU matmul).
    """
    sq_s = jnp.sum(src**2, axis=-1, keepdims=True)          # [M,1]
    sq_t = jnp.sum(target**2, axis=-1)[None, :]             # [1,N]
    d2 = sq_s + sq_t - 2.0 * src @ target.T                 # [M,N]
    big = jnp.asarray(1e30, d2.dtype)
    d2 = jnp.where(target_mask[None, :], d2, big)
    idx = jnp.argmin(d2, axis=-1)
    dmin = jnp.take_along_axis(d2, idx[:, None], axis=-1)[:, 0]
    return target[idx], jnp.sqrt(jnp.maximum(dmin, 0.0))


@partial(jax.jit, static_argnames=("iterations", "use_pallas"))
def icp_refine(template, ee_points, ee_mask, init_pose, iterations=30,
               threshold=0.1, use_pallas=False):
    """Refine ``init_pose`` so that template (in the EE frame) matches the
    observed EE points.

    Args:
      template: [M, 3] source cloud in the canonical EE frame.
      ee_points: [N, 3] observed points (camera frame, padded).
      ee_mask: [N] validity.
      init_pose: [7] WXYZ seed pose (e.g. the NN prediction).
      iterations: fixed iteration count (Open3D default max_iteration=30).
      threshold: correspondence distance cutoff (reference 0.1 m).

    Returns the refined [7] pose.  With no valid points, returns init_pose.
    """
    init_mat = pose_to_matrix(init_pose)

    def body(carry, _):
        r, t = carry  # template -> camera
        src = template @ r.T + t
        if use_pallas:
            from ..ops.nn_pallas import nn_search_pallas

            idx, d2 = nn_search_pallas(src, ee_points, ee_mask)
            match = ee_points[idx]
            dist = jnp.sqrt(jnp.maximum(d2, 0.0))
        else:
            match, dist = _nn_correspondences(src, ee_points, ee_mask)
        w = (dist < threshold).astype(template.dtype)
        # guard: all-rejected -> keep previous transform via zero update
        wsum = jnp.sum(w)
        w_safe = jnp.where(wsum > 3, w, jnp.ones_like(w))
        r_new, t_new = kabsch(template, match, weights=w_safe)
        keep = wsum > 3
        r = jnp.where(keep, r_new, r)
        t = jnp.where(keep, t_new, t)
        return (r, t), None

    has_points = jnp.sum(ee_mask) > 3
    (r, t), _ = jax.lax.scan(body, (init_mat[:3, :3], init_mat[:3, 3]),
                             None, length=iterations)
    mat = jnp.eye(4, dtype=init_mat.dtype)
    mat = mat.at[:3, :3].set(r).at[:3, 3].set(t)
    refined = matrix_to_pose(mat)
    return jnp.where(has_points, refined, init_pose)


def icp_refine_batch(template, ee_points, ee_mask, init_poses, iterations=30,
                     threshold=0.1):
    """vmap of :func:`icp_refine` over a batch of clouds/poses."""
    fn = partial(icp_refine, iterations=iterations, threshold=threshold)
    return jax.vmap(lambda p, m, q: fn(template, p, m, q))(
        ee_points, ee_mask, init_poses)
