"""Voxel quantization: points -> sparse voxels (sort-based dedup, jit-safe).

TPU-native replacement for ``ME.utils.sparse_quantize`` (data/alivev2.py:289)
and ``ME.TensorField(...).sparse()`` with UNWEIGHTED_AVERAGE quantization
(app/inference_engine.py:405-417):

- integer voxel coords are ``floor(points / quantization_size)``,
- features are averaged over points in a voxel,
- labels merge to the common value or ``ignore_label`` on conflict,
- the inverse point->voxel map is returned so per-voxel outputs can be
  "sliced" back onto the original points (ME ``.slice``).

Implementation: pack coords into 30-bit keys, single ascending sort per batch
item, segment reductions keyed on run-ids.  Everything is fixed shape; points
outside the 1024³ voxel window or beyond voxel capacity are dropped (mirrors
the reference's max_npoint crop, config/default.yaml:26).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .sorting import argsort_keys
from .types import (
    COORD_OFFSET,
    COORD_RANGE,
    KEY_PAD,
    SparseVoxels,
    pack_key,
    unpack_key,
)


def _voxelize_one(feats, labels, skey, order, capacity, ignore_label):
    """Single-item voxelization over presorted keys.

    ``skey``/``order`` come from the batched impl-dispatched argsort
    (sparse/sorting.py) hoisted out of the vmap — the Pallas bitonic
    kernel runs once over [B, P] instead of per item."""
    p = skey.shape[0]
    sfeats = feats[order]

    first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    run_id = jnp.cumsum(first) - 1  # 0-based run index in sorted order
    pt_valid = skey < KEY_PAD
    # runs beyond capacity or padding runs go to the dump row `capacity`
    vid = jnp.where(pt_valid & (run_id < capacity), run_id, capacity)

    ones = jnp.ones((p,), dtype=feats.dtype)
    cnt = jax.ops.segment_sum(ones, vid, num_segments=capacity + 1)[:capacity]
    fsum = jax.ops.segment_sum(sfeats, vid, num_segments=capacity + 1)[:capacity]
    vvalid = cnt > 0
    fmean = fsum / jnp.maximum(cnt, 1.0)[:, None]

    ukey = jax.ops.segment_min(skey, vid, num_segments=capacity + 1)[:capacity]
    ukey = jnp.where(vvalid, ukey, KEY_PAD)
    uoff = jnp.where(vvalid[:, None], unpack_key(ukey), 0)

    # point -> voxel index in original point order (capacity = "no voxel")
    pv = jnp.zeros((p,), jnp.int32).at[order].set(vid.astype(jnp.int32))

    if labels is not None:
        slab = labels[order].astype(jnp.int32)
        lmin = jax.ops.segment_min(slab, vid, num_segments=capacity + 1)[:capacity]
        lmax = jax.ops.segment_max(slab, vid, num_segments=capacity + 1)[:capacity]
        ulab = jnp.where(vvalid & (lmin == lmax), lmin, ignore_label)
    else:
        ulab = None

    voxels = SparseVoxels(
        off=uoff,
        key=ukey,
        feats=jnp.where(vvalid[:, None], fmean, 0.0),
        valid=vvalid,
        count=jnp.sum(vvalid).astype(jnp.int32),
    )
    return voxels, pv, ulab


@partial(jax.jit, static_argnames=("capacity", "ignore_label", "with_labels"))
def voxelize(points, feats, mask, quantization_size, capacity,
             labels=None, ignore_label=-100, with_labels=False):
    """Batched voxelization.

    Args:
      points: [B, P, 3] float points (metres).
      feats:  [B, P, C] per-point features.
      mask:   [B, P] validity of input points (padding rows False).
      quantization_size: voxel edge length (scalar; 1/scale in the reference).
      capacity: static per-item voxel capacity N.
      labels: optional [B, P] int labels.
      ignore_label: conflict label (reference DATA.ignore_label = -100).

    Returns:
      (SparseVoxels, point_to_voxel [B, P] int32, labels [B, N] or None)
    """
    if labels is None:
        labels = jnp.zeros(points.shape[:2], jnp.int32) if with_labels else None
    coords = jnp.floor(points / quantization_size).astype(jnp.int32)
    off = coords + COORD_OFFSET
    in_range = jnp.all((off >= 0) & (off < COORD_RANGE), axis=-1)
    ok = in_range & mask
    key = jnp.where(ok, pack_key(off), KEY_PAD)
    skey, order = argsort_keys(key)

    fn = partial(
        _voxelize_one,
        capacity=capacity,
        ignore_label=ignore_label,
    )
    if labels is None:
        vox, pv, _ = jax.vmap(lambda f, sk, o: fn(f, None, sk, o))(
            feats, skey, order)
        return vox, pv, None
    vox, pv, lab = jax.vmap(fn)(feats, labels, skey, order)
    return vox, pv, lab


def slice_to_points(voxel_values, point_to_voxel, fill_value=0.0):
    """Map per-voxel values back onto original points (ME ``.slice``).

    Args:
      voxel_values: [B, N, C] per-voxel outputs (e.g. logits).
      point_to_voxel: [B, P] from :func:`voxelize` (== N means "no voxel").
    Returns:
      [B, P, C]; points without a voxel get ``fill_value``.
    """
    b, n, c = voxel_values.shape
    padded = jnp.concatenate(
        [voxel_values, jnp.full((b, 1, c), fill_value, voxel_values.dtype)], axis=1
    )
    return jnp.take_along_axis(padded, point_to_voxel[..., None], axis=1)
