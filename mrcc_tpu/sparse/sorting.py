"""Impl-dispatched batched key argsort for the sparse core.

One chokepoint for every sort in the voxel pipeline (voxelize's point-key
sort, each hierarchy downsample's parent-key sort) so the Pallas bitonic
kernel (ops/sort_pallas.py) can carry them on TPU while the XLA stable
sort remains the oracle path — same dispatch contract as the conv/rank
kernels (sparse/impl.py).

``MRCC_SORT_KERNEL=0`` forces the XLA path even under the pallas impl
(escape hatch, mirrors MRCC_CONV_PLAN=plain).
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from .impl import current as _current_impl


def _use_kernel(n: int) -> bool:
    if os.environ.get("MRCC_SORT_KERNEL", "1") == "0":
        return False
    if _current_impl() not in ("pallas", "pallas-int8"):
        return False
    from ..ops.sort_pallas import supported

    return supported(n)


def argsort_keys(key):
    """Stable ascending argsort of packed keys.

    Args:
      key: int32 [B, N] packed voxel keys (KEY_PAD padding).
    Returns:
      (sorted_key [B, N], order [B, N] int32) with
      ``sorted_key == take_along_axis(key, order, axis=-1)`` and stable
      order among duplicates (exact jnp stable-argsort parity).
    """
    if _use_kernel(key.shape[-1]):
        from ..ops.sort_pallas import bitonic_argsort

        return bitonic_argsort(key)
    order = jnp.argsort(key, axis=-1, stable=True).astype(jnp.int32)
    return jnp.take_along_axis(key, order, axis=-1), order
