"""Fixed-shape sparse voxel containers (pytree dataclasses).

Design (TPU-first, not a MinkowskiEngine port): every batch item owns a
fixed-capacity row block ``[B, N, ...]`` with a validity mask, voxels sorted
by a packed 30-bit spatial key.  All downstream ops (quantize, kernel maps,
convolutions) are pure functions of these static-shape buffers, so one jit
program serves every cloud size up to capacity and the batch axis shards
cleanly over a device mesh.

Replaces ME ``SparseTensor`` / ``TensorField`` / ``batched_coordinates``
(reference: data/alivev2.py:289-296, app/inference_engine.py:405-417).

Coordinate packing: per level, voxel coordinates are stored as *offset*
coordinates ``off = coord + 512`` in ``[0, 1024)`` (10 bits/axis) and packed
``key = off_x<<20 | off_y<<10 | off_z`` in ``[0, 2^30)``.  ``KEY_PAD``
(2^30) marks padding rows and sorts after every valid key.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

COORD_BITS = 10
COORD_RANGE = 1 << COORD_BITS  # 1024
COORD_OFFSET = COORD_RANGE // 2  # 512
KEY_PAD = jnp.int32(1 << (3 * COORD_BITS))  # 2**30, sorts after all valid keys


def pack_key(off):
    """Pack non-negative offset coords (..., 3) into int32 keys."""
    off = off.astype(jnp.int32)
    return (off[..., 0] << (2 * COORD_BITS)) | (off[..., 1] << COORD_BITS) | off[..., 2]


def unpack_key(key):
    """Inverse of pack_key -> (..., 3) offset coords; padding unpacks to 0."""
    key = key.astype(jnp.int32)
    mask = COORD_RANGE - 1
    x = (key >> (2 * COORD_BITS)) & mask
    y = (key >> COORD_BITS) & mask
    z = key & mask
    return jnp.stack([x, y, z], axis=-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SparseVoxels:
    """A batch of sparse voxel grids with per-item fixed capacity.

    Attributes:
      off:   int32 [B, N, 3] offset coords (coord + COORD_OFFSET at level 0;
             zeros at padding rows).
      key:   int32 [B, N] packed keys, ascending per item; KEY_PAD at padding.
      feats: float [B, N, C] features; zeros at padding rows (invariant all
             ops maintain).
      valid: bool  [B, N].
      count: int32 [B] number of valid voxels per item.
    """

    off: jax.Array
    key: jax.Array
    feats: jax.Array
    valid: jax.Array
    count: jax.Array

    @property
    def batch(self) -> int:
        return self.off.shape[0]

    @property
    def capacity(self) -> int:
        return self.off.shape[1]

    @property
    def channels(self) -> int:
        return self.feats.shape[-1]

    def coords(self):
        """Signed level-0 voxel coordinates (int32 [B, N, 3])."""
        return self.off - COORD_OFFSET

    def with_feats(self, feats) -> "SparseVoxels":
        """Return a copy with new features (zeroing padding rows)."""
        feats = jnp.where(self.valid[..., None], feats, 0.0)
        return dataclasses.replace(self, feats=feats)
