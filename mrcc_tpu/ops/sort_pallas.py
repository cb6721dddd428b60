"""Pallas bitonic argsort over packed voxel keys.

Sorting is the backbone of the sparse core's host-free pipeline: voxelize
argsorts the [B, P] point keys and every hierarchy downsample argsorts the
child-level parent keys (sparse/quantize.py, sparse/hierarchy.py — the TPU
rebuild of ME's coordinate manager, reference data/alivev2.py:289-296).
XLA's TPU sort costs ~13 ms for the B=8/16k voxelize alone (RESULTS.md
round-3 stage profile); this kernel keeps the whole array VMEM-resident
and runs the full bitonic network on the VPU in ONE program.

Formulation (TPU-native):
- the [N] array lives as [R, 128] (sublanes x lanes); every bitonic
  exchange partner ``i ^ j`` is a ROLL: along lanes for j < 128, along
  sublanes (by j/128 rows) for j >= 128 — no gathers, no transposes,
  uniform code for all log2(N)*(log2(N)+1)/2 stages.
- direction ``(i & k) == 0`` and side ``(i & j) == 0`` masks come from one
  hoisted 2-D global-index iota (static per stage).
- stability (exact stable-``jnp.argsort`` parity): sort inputs here are
  DUPLICATE-heavy (many points share a voxel, many children a parent), so
  every compare-exchange breaks key ties on the riding permutation —
  lexicographic (key, perm) order, which equals stable order.

The permutation rides along as a second [R, 128] int32 array swapped by the
same select masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse.types import KEY_PAD

_LANES = 128


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def supported(n: int) -> bool:
    """Shapes the kernel accepts after pow2 padding (VMEM budget: the
    padded key+perm pair plus temporaries must stay well under ~8 MB)."""
    n2 = _next_pow2(n)
    return _LANES <= n2 <= (1 << 17)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def _stage(k, j, i2d, key, perm):
    """One bitonic compare-exchange stage (arrays [R, 128] int32)."""
    if j >= _LANES:
        jr = j // _LANES
        pk_lo = jnp.roll(key, -jr, axis=0)   # partner for (i & j) == 0
        pk_hi = jnp.roll(key, jr, axis=0)
        pp_lo = jnp.roll(perm, -jr, axis=0)
        pp_hi = jnp.roll(perm, jr, axis=0)
    else:
        pk_lo = jnp.roll(key, -j, axis=1)
        pk_hi = jnp.roll(key, j, axis=1)
        pp_lo = jnp.roll(perm, -j, axis=1)
        pp_hi = jnp.roll(perm, j, axis=1)
    bit_clear = (i2d & j) == 0
    pkey = jnp.where(bit_clear, pk_lo, pk_hi)
    pperm = jnp.where(bit_clear, pp_lo, pp_hi)
    # ascending block iff (i & k) == 0; element keeps the smaller of the
    # pair iff it is the low index of the pair XNOR descending
    up = (i2d & k) == 0
    keep_small = bit_clear == up
    # lexicographic (key, perm): stable order under duplicate keys
    self_small = (key < pkey) | ((key == pkey) & (perm < pperm))
    take_self = keep_small == self_small
    return (jnp.where(take_self, key, pkey),
            jnp.where(take_self, perm, pperm))


def _sort_kernel(key_ref, skey_ref, perm_ref, *, n2):
    key = key_ref[0]                                  # [R, 128]
    r = n2 // _LANES
    row = jax.lax.broadcasted_iota(jnp.int32, (r, _LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, _LANES), 1)
    i2d = row * _LANES + lane
    perm = i2d

    k = 2
    while k <= n2:
        j = k // 2
        while j >= 1:
            key, perm = _stage(k, j, i2d, key, perm)
            j //= 2
        k *= 2

    skey_ref[0] = key
    perm_ref[0] = perm


@functools.partial(jax.jit, static_argnames=())
def bitonic_argsort(key):
    """Sort packed keys ascending, returning (sorted_key, perm) — exact
    ``jnp.sort`` / stable ``jnp.argsort`` parity.

    Args:
      key: int32 [B, N], valid entries unique and < KEY_PAD, padding rows
        exactly KEY_PAD.  N need not be a power of two.
    Returns:
      (sorted_key [B, N] int32, perm [B, N] int32) with
      ``sorted_key == take_along_axis(key, perm)``.
    """
    b, n = key.shape
    n2 = _next_pow2(max(n, _LANES))
    if n2 != n:
        key = jnp.pad(key, ((0, 0), (0, n2 - n)),
                      constant_values=int(KEY_PAD))
    r = n2 // _LANES
    key3 = key.reshape(b, r, _LANES)

    kernel = functools.partial(_sort_kernel, n2=n2)
    skey, perm = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, r, _LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, r, _LANES), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, r, _LANES), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((b, r, _LANES), jnp.int32),
                   jax.ShapeDtypeStruct((b, r, _LANES), jnp.int32)],
        interpret=_interpret(),
    )(key3)
    skey = skey.reshape(b, n2)[:, :n]
    perm = perm.reshape(b, n2)[:, :n]
    return skey, perm
