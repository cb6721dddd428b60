"""Pallas TPU kernel: fused nearest-neighbour search (distance + argmin).

The ICP inner loop (mrcc_tpu/solve/icp.py) needs, for every posed template
point, its nearest valid target point.  The jnp formulation materialises the
[M, N] squared-distance matrix in HBM each iteration; this kernel tiles over
template rows, keeps the distance tile in VMEM, and reduces to (index,
distance) on the fly — the matrix never touches HBM.

Layout notes (see pallas_guide.md): the [TILE_M, N] tile is MXU/VPU aligned
(N is a lane multiple of 128), the 3-wide coordinate operands ride in VMEM
as tiny blocks, and argmin is computed with a broadcasted-iota compare
(2D iota — 1D iota fails on TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nn_kernel(tpl_ref, tgt_t_ref, sqt_ref, idx_ref, dist_ref):
    tpl = tpl_ref[:]                       # [TILE_M, 3]
    tgt_t = tgt_t_ref[:]                   # [3, N]
    sqt = sqt_ref[:]                       # [1, N] (masked: +big at invalid)
    st = jnp.dot(tpl, tgt_t, preferred_element_type=jnp.float32)  # [TILE_M, N]
    sqs = jnp.sum(tpl * tpl, axis=-1, keepdims=True)              # [TILE_M, 1]
    d2 = sqs - 2.0 * st + sqt                                     # [TILE_M, N]
    dmin = jnp.min(d2, axis=-1, keepdims=True)                    # [TILE_M, 1]
    n = d2.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    big = jnp.asarray(jnp.iinfo(jnp.int32).max, jnp.int32)
    idx = jnp.min(jnp.where(d2 <= dmin, col, big), axis=-1, keepdims=True)
    idx_ref[:] = idx
    dist_ref[:] = dmin


@partial(jax.jit, static_argnames=("tile_m", "interpret"))
def nn_search_pallas(template, target, target_mask, tile_m=256,
                     interpret=False):
    """For each template point, the nearest valid target point.

    Args:
      template: [M, 3] float32 query points (M a multiple of tile_m —
        callers pad; solve.icp templates are powers of two).
      target: [N, 3] float32 candidate points (N a multiple of 128).
      target_mask: [N] validity.
    Returns (idx [M] int32, d2 [M] float32 squared distances).
    """
    m = template.shape[0]
    n = target.shape[0]
    assert m % tile_m == 0, (m, tile_m)
    tgt_t = jnp.where(target_mask[None, :], target.T, 0.0).astype(jnp.float32)
    sqt = jnp.where(target_mask, jnp.sum(target * target, axis=-1),
                    jnp.asarray(1e30, jnp.float32))[None, :]
    template = template.astype(jnp.float32)

    grid = (m // tile_m,)
    idx, d2 = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, 3), lambda i: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((3, n), lambda i: (0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, 1), jnp.int32),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ),
        interpret=interpret,
    )(template, tgt_t, sqt)
    return idx[:, 0], d2[:, 0]
