"""Coordinate hierarchy + kernel maps for sparse U-Nets.

This is the TPU replacement for MinkowskiEngine's CoordinateManager and
cached kernel maps (reference: model/backbone/minkunet.py uses k=3 s=1 convs
inside blocks at every stride level, k=2 s=2 convs/transpose-convs between
levels).  We precompute, per stride level:

- the unique voxel set (sorted packed keys),
- the 27-neighbour table for k=3 s=1 convs (``nbr_idx``/``nbr_hit``),
- parent links (index of the stride-2L parent + which of the 8 child octants
  this voxel occupies) for stride-2 transpose convs,
- child tables (for each parent, its up-to-8 children) for stride-2 convs
  and max-pools.

Because the U-Net is coordinate-symmetric, transpose convs simply reuse the
finer level's cached coordinate set — exactly ME's behaviour when the target
stride already exists in its coordinate manager (SURVEY.md §2.1), and the
reason no generative coordinate logic is needed.

Neighbour lookups are binary searches (``jnp.searchsorted``) over the sorted
keys — O(N log N) with fully static shapes, XLA-friendly.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .impl import current as _current_impl
from .sorting import argsort_keys
from .types import COORD_BITS, COORD_RANGE, KEY_PAD, SparseVoxels, pack_key, unpack_key

# Offset enumeration orders (static numpy, baked into the jit program).
# K3_OFFSETS matches ME's region iteration order for kernel_size=3 (z fastest).
K3_OFFSETS = np.array(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    dtype=np.int32,
)
K2_OFFSETS = np.array(
    [[dx, dy, dz] for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
    dtype=np.int32,
)


def _lookup(sorted_keys, queries):
    """Binary-search queries in per-item sorted keys.

    sorted_keys: [N] ascending (padding = KEY_PAD).
    queries:     [M] packed keys (KEY_PAD for invalid queries).
    Returns (idx [M] int32 clamped to [0, N-1], hit [M] bool).
    """
    n = sorted_keys.shape[0]
    # method='sort' wins on TPU: 'scan' does ~13 dependent gather rounds
    # and TPU gathers run far off roofline (measured honestly with forced
    # host sync: scan 203 ms vs sort 28 ms for 1.8M queries over 8k keys)
    idx = jnp.searchsorted(sorted_keys, queries, side="left",
                           method="sort").astype(jnp.int32)
    idx = jnp.minimum(idx, n - 1)
    hit = (sorted_keys[idx] == queries) & (queries < KEY_PAD)
    return idx, hit


def _use_rank_kernel(n_keys, n_queries) -> bool:
    """Route lookups through ops/rank_pallas.py (windowed-rank kernel,
    no sorts) when the pallas impl is active and shapes tile."""
    if _current_impl() not in ("pallas", "pallas-int8"):
        return False
    # the kernel's lane-dimension slices require 128-aligned shapes
    return (n_queries % 128 == 0 and n_keys % 128 == 0
            and n_queries >= 128 and n_keys >= 128)


def _use_self_keyed(n) -> bool:
    """Route k=3 neighbour resolution through the SELF-KEYED conv
    (ops/conv_pallas.py): no tables at all.  The gate mirrors
    conv_pallas.sk_supported (lane-packing included) at the impl's table
    itemsize — 2 for bf16 'pallas' (fwd AND the custom-VJP training
    direction), 1 for 'pallas-int8' quantized tables."""
    impl = _current_impl()
    if impl not in ("pallas", "pallas-int8"):
        return False
    from ..ops.conv_pallas import sk_pack

    # UNPACKED levels only: residency-packed sk convs pay pack-fold extra
    # key compares on EVERY conv of the level, measured to exceed the
    # one-off table-build saving at production scale (probe_prod_sk, r5:
    # int8 72448-row level — hier -34 ms vs U-Net +61 ms).  Packed levels
    # keep the rank tables; the packed sk kernel remains available for
    # explicit use (ops/conv_pallas.py).
    return sk_pack(n, itemsize=1 if impl == "pallas-int8" else 2) == 1


def _neighbor_maps(off, key, valid, offsets, self_keyed=False):
    """k=3 neighbour resolution for one level: either a self-keyed pack
    (no tables) or the (idx, hit, tiled) tables."""
    if self_keyed and _use_self_keyed(key.shape[1]):
        from ..ops.rank_pallas import sk_neighbor_pack

        return dict(nbr_sk=sk_neighbor_pack(off, key, valid, offsets))
    nbr_idx, nbr_hit, nbr_tiled = _neighbor_tables(off, key, valid, offsets)
    return dict(nbr_idx=nbr_idx, nbr_hit=nbr_hit, nbr_tiled=nbr_tiled)


def _neighbor_tables(off, key, valid, offsets):
    """Batched 27-neighbour tables [K, B, N] (impl-dispatched).

    Returns (idx, hit, tiled-or-None)."""
    if _use_rank_kernel(key.shape[1], key.shape[1]):
        from ..ops.rank_pallas import neighbor_tables

        return neighbor_tables(off, key, valid, offsets, return_tiled=True)
    idx, hit = jax.vmap(
        partial(_neighbor_table_one, offsets=offsets),
        in_axes=(0, 0, 0), out_axes=(1, 1),
    )(off, key, valid)
    return idx, hit, None


def _child_tables(parent_off, parent_key, parent_valid, child_key, offsets,
                  stride=2):
    """Batched strided kernel maps [K, B, Np] (impl-dispatched).

    Returns (idx, hit, tiled-or-None)."""
    is_pow2 = stride & (stride - 1) == 0
    if is_pow2 and _use_rank_kernel(child_key.shape[1],
                                    parent_key.shape[1]):
        from ..ops.rank_pallas import child_tables

        return child_tables(parent_off, parent_key, parent_valid, child_key,
                            offsets, stride=stride, return_tiled=True)
    idx, hit = jax.vmap(
        partial(_child_table_one, offsets=offsets, stride=stride),
        in_axes=(0, 0, 0), out_axes=(1, 1),
    )(parent_off, parent_valid, child_key)
    return idx, hit, None


def _up_tiled_maps(parent_idx, parent_ok, octant, fine_valid,
                   coarse_capacity):
    """Tiled 8-octant transpose-conv map (pallas impl only).

    As a kernel map over the COARSE table: idx_k = parent_idx for every
    octant k, hit_k selects fine voxels occupying octant k whose parent
    exists (parent_idx is monotone since fine keys are sorted)."""
    from ..ops.conv_pallas import build_tiled_maps

    k = 8
    idx8 = jnp.broadcast_to(parent_idx[None], (k,) + parent_idx.shape)
    hit_any = fine_valid & parent_ok
    hit8 = (octant[None] == jnp.arange(k)[:, None, None]) & hit_any[None]
    # union spans: every offset shares the SAME index vector, so the
    # window scalars must cover the any-octant span — enables the conv
    # kernel's bcast_k mode (one gather per group instead of 8)
    span8 = jnp.broadcast_to(hit_any[None], hit8.shape)
    return build_tiled_maps(idx8, hit8, coarse_capacity, span_hit=span8)


def _neighbor_table_one(off, key, valid, offsets):
    """27 (or 8) neighbour indices for one item. off [N,3], key [N] sorted.

    Delta trick: within the coordinate window, ``pack(off + d)`` equals
    ``key + pack_delta(d)`` exactly (each field shifts by a constant without
    carries), so all K·N queries are computed directly from the sorted keys
    and resolved with ONE flattened searchsorted — no per-offset repacking.
    """
    offsets = jnp.asarray(offsets)
    n = key.shape[0]
    # arithmetic (NOT bitwise) packing: offsets are signed
    deltas = (offsets[:, 0] * (1 << (2 * COORD_BITS))
              + offsets[:, 1] * (1 << COORD_BITS) + offsets[:, 2])  # [K]
    q_off = off[None, :, :] + offsets[:, None, :]               # [K, N, 3]
    in_range = jnp.all((q_off >= 0) & (q_off < COORD_RANGE), axis=-1)
    q = jnp.where(valid[None, :] & in_range, key[None, :] + deltas[:, None],
                  KEY_PAD)
    idx = jnp.searchsorted(key, q.reshape(-1), side="left",
                           method="sort").astype(jnp.int32)
    idx = jnp.minimum(idx.reshape(q.shape), n - 1)
    hit = (key[idx] == q) & (q < KEY_PAD)
    return idx, hit  # [K, N], [K, N]


def _downsample_sort(off, valid, stride=2):
    """Batched parent-key sort for a stride-s downsample: [B, N] keys ->
    (sorted keys, permutation) via the impl-dispatched argsort."""
    p_key = jnp.where(valid, pack_key(off // stride), KEY_PAD)
    return argsort_keys(p_key)


def _downsample_one(off, valid, skey, order, capacity, stride=2,
                    child_table=False):
    """Unique parent voxels (stride-s floor division) for one item, over a
    presorted parent-key permutation from :func:`_downsample_sort`.

    Returns (parent SparseVoxels-like fields, parent_idx [N], octant [N]
    [, child_idx [8, Np], child_hit [8, Np] when ``child_table``]).

    ``child_table`` (stride 2 only): ALSO emit the k=2 s=2 kernel map by
    SCATTER — each (parent slot, octant) holds at most one child (voxel
    uniqueness), and the sorted run already pairs every child with its
    parent slot, so ``table[octant[j], run_id[j]] = orig_index(j)`` builds
    the exact same table the rank-kernel/searchsorted path computes
    (child orig index IS its rank in the sorted child keys; queries
    ``2*parent_key + delta`` are monotone in parent slot) at O(N) scatter
    cost instead of K*Np lookups — measured 7.8 ms of the B=8/16k
    hierarchy build (RESULTS r4 breakdown), eliminated in r5.

    ONE argsort does everything: the sorted run index of each child's
    parent key IS its parent's slot in the unique set, scattered back
    through the sort permutation — no second searchsorted (sorts are the
    dominant cost of hierarchy construction on TPU; the batched sort is
    hoisted out of the vmap so the Pallas bitonic kernel can carry it).

    NOTE a sort-free variant (run-ids straight off ``p_key``) is
    INCORRECT: per-field floor division does not preserve the
    lexicographic arithmetic packing across field boundaries
    ((0,1023,1023) < (1,0,0) but their stride-2 parents compare the other
    way), so parent keys of sorted children are only piecewise sorted —
    measured on-chip: run-id dedup then inflates unique counts ~3x at the
    deep levels.
    """
    n = off.shape[0]
    first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    run_id = jnp.cumsum(first) - 1
    ok = (skey < KEY_PAD) & (run_id < capacity)
    vid = jnp.where(ok, run_id, capacity)
    ukey = jax.ops.segment_min(skey, vid, num_segments=capacity + 1)[:capacity]
    cnt = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), vid,
                              num_segments=capacity + 1)[:capacity]
    uvalid = cnt > 0
    ukey = jnp.where(uvalid, ukey, KEY_PAD)
    uoff = jnp.where(uvalid[:, None], unpack_key(ukey), 0)

    # child -> parent link: scatter the run index back through the sort.
    # parent_ok marks children whose parent actually made it into the
    # fixed-capacity unique set (overflowed parents would otherwise alias
    # slot capacity-1 and corrupt transpose convs / conv-down backward).
    parent_idx = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.minimum(run_id, capacity - 1).astype(jnp.int32))
    parent_ok = jnp.zeros((n,), bool).at[order].set(ok)
    octant = (((off[:, 0] % stride) << 2) | ((off[:, 1] % stride) << 1)
              | (off[:, 2] % stride))
    octant = jnp.where(valid, octant, 0).astype(jnp.int32)
    base = (uoff, ukey, uvalid, jnp.sum(uvalid).astype(jnp.int32),
            parent_idx, parent_ok, octant)
    if not child_table:
        return base
    # K2_OFFSETS enumeration k = dx*4 + dy*2 + dz over {0,1}^3 equals the
    # octant encoding above, so the scatter slot IS the offset index
    assert stride == 2
    oct_s = jnp.take(octant, order)                  # sorted-child octants
    slot = jnp.where(ok, run_id * 8 + oct_s, capacity * 8)
    cidx = jnp.zeros((capacity * 8 + 1,), jnp.int32).at[slot].set(
        order.astype(jnp.int32))
    chit = jnp.zeros((capacity * 8 + 1,), bool).at[slot].set(ok)
    child_idx = cidx[:capacity * 8].reshape(capacity, 8).T   # [8, Np]
    child_hit = chit[:capacity * 8].reshape(capacity, 8).T
    return base + (child_idx, child_hit)


def _child_table_one(parent_off, parent_valid, child_key, offsets=K2_OFFSETS,
                     stride=2):
    """Strided kernel map: for each parent voxel and kernel offset, the input
    (child-level) voxel index at ``parent*stride + offset``.

    With the default K2_OFFSETS/stride 2 this is the k=2 s=2 map; pass
    K3_OFFSETS for ME's kernel_size=3 strided convs (offsets centred on
    ``parent*stride``, matching ME's odd-kernel convention).
    """
    def per_offset(d):
        q_off = parent_off * stride + d
        in_range = jnp.all((q_off >= 0) & (q_off < COORD_RANGE), axis=-1)
        q = jnp.where(parent_valid & in_range, pack_key(q_off), KEY_PAD)
        return _lookup(child_key, q)

    idx, hit = jax.vmap(per_offset)(jnp.asarray(offsets))
    return idx, hit  # [K, Np], [K, Np]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Level:
    """One stride level of the coordinate hierarchy.

    Attributes:
      off/key/valid/count: the voxel set ([B, N, 3], [B, N], [B, N], [B]).
      nbr_idx/nbr_hit: [27, B, N] k=3 s=1 kernel map (None until built).
      parent_idx: [B, N] index into the next-coarser level (level l+1).
      parent_ok:  [B, N] whether the parent exists in the (fixed-capacity)
        coarser level — False for children of overflowed parents.
      octant:     [B, N] which of 8 children of that parent this voxel is.
      child_idx/child_hit: [8, B, Np-of-coarser]… stored on the COARSER level:
        for each of its voxels, the indices of its children in THIS level.
    """

    off: jax.Array
    key: jax.Array
    valid: jax.Array
    count: jax.Array
    nbr_idx: Optional[jax.Array] = None
    nbr_hit: Optional[jax.Array] = None
    parent_idx: Optional[jax.Array] = None
    parent_ok: Optional[jax.Array] = None
    octant: Optional[jax.Array] = None
    child_idx: Optional[jax.Array] = None
    child_hit: Optional[jax.Array] = None
    # conv-ready tiled map packs (pallas impl only): tuples
    # (idx_t-with-misses-encoded, starts, nchunks) from ops/rank_pallas.py
    # — every conv on the level shares them, skipping per-call map prep
    nbr_tiled: Optional[tuple] = None
    child_tiled: Optional[tuple] = None
    # tiled 8-octant "up map" (each fine voxel gathers its parent in the
    # COARSER level's table): forward map of k=2 s=2 transpose convs and
    # backward map of k=2 s=2 down convs (ops/conv_pallas.py custom VJP)
    up_tiled: Optional[tuple] = None
    # self-keyed k3 pack (kbits, starts, nchunks): convs build their
    # one-hot from the level's sorted keys in-kernel — no rank-kernel
    # table build (inference-only; see ops/conv_pallas.py)
    nbr_sk: Optional[tuple] = None


def build_hierarchy(voxels: SparseVoxels, depth: int,
                    capacities: Optional[Tuple[int, ...]] = None,
                    build_k3: bool = True,
                    k3_self_keyed: bool = False) -> Tuple[Level, ...]:
    """Build ``depth+1`` stride levels (stride 1, 2, ..., 2^depth).

    Args:
      voxels: level-0 voxel set from :func:`mrcc_tpu.sparse.quantize.voxelize`.
      depth: number of stride-2 downsamplings (MinkUNet uses 4).
      capacities: static per-level voxel capacities for levels 1..depth;
        defaults to full capacity at level 1 then halving (stride-2 on
        surface-like voxel data typically shrinks 4-8x, but worst-case
        sparse data barely shrinks at the first level).
      build_k3: also build the 27-neighbour tables (needed by k=3 convs).
      k3_self_keyed: resolve k=3 neighbours with the SELF-KEYED conv
        kernel where supported (no tables; inference-only — the self-keyed
        path has no VJP, so trainers must leave this False).

    Returns a tuple of ``depth+1`` Levels, finest first.
    """
    b, n0 = voxels.key.shape
    if capacities is None:
        capacities = tuple(max(n0 >> l, 64) for l in range(depth))
    assert len(capacities) == depth

    levels = []
    cur = Level(off=voxels.off, key=voxels.key, valid=voxels.valid,
                count=voxels.count)
    for l in range(depth):
        cap = capacities[l]
        skey, order = _downsample_sort(cur.off, cur.valid)
        (uoff, ukey, uvalid, ucount, parent_idx, parent_ok, octant,
         child_idx_b, child_hit_b) = jax.vmap(
            partial(_downsample_one, capacity=cap, child_table=True)
        )(cur.off, cur.valid, skey, order)
        # k=2 s=2 kernel map by scatter through the downsample sort (see
        # _downsample_one) — no searchsorted/rank-kernel lookups
        child_idx = child_idx_b.transpose(1, 0, 2)          # [8, B, Np]
        child_hit = child_hit_b.transpose(1, 0, 2)
        child_tiled = None
        if _use_rank_kernel(cur.key.shape[1], cap):
            from ..ops.conv_pallas import build_tiled_maps

            child_tiled = build_tiled_maps(child_idx, child_hit,
                                           cur.key.shape[1])
        up_tiled = None
        if (_current_impl() in ("pallas", "pallas-int8")
                and cur.key.shape[1] % 8 == 0):
            up_tiled = _up_tiled_maps(parent_idx, parent_ok, octant,
                                      cur.valid, cap)
        cur = dataclasses.replace(cur, parent_idx=parent_idx,
                                  parent_ok=parent_ok, octant=octant,
                                  up_tiled=up_tiled)
        if build_k3:
            cur = dataclasses.replace(cur, **_neighbor_maps(
                cur.off, cur.key, cur.valid, K3_OFFSETS,
                self_keyed=k3_self_keyed))
        levels.append(cur)
        cur = Level(off=uoff, key=ukey, valid=uvalid, count=ucount,
                    child_idx=child_idx, child_hit=child_hit,
                    child_tiled=child_tiled)

    if build_k3:
        cur = dataclasses.replace(cur, **_neighbor_maps(
            cur.off, cur.key, cur.valid, K3_OFFSETS,
            self_keyed=k3_self_keyed))
    levels.append(cur)
    return tuple(levels)


def downsample_level(level: Level, capacity: int, stride: int = 2,
                     kernel_size: int = 2, build_k3: bool = True):
    """Build the next-coarser level for an arbitrary (kernel_size, stride) conv.

    Used by the sparse ResNet path, which mixes k=3 s=2, k=2 s=2 pooling and
    k=3 s=3 convolutions (reference resnet.py:51-80).  Returns
    ``(fine_level_with_parent_links, coarse_level)`` where the coarse level
    carries the strided kernel map in ``child_idx``/``child_hit``.
    """
    offsets = K2_OFFSETS if kernel_size == 2 else np.array(
        [[dx, dy, dz]
         for dx in range(-(kernel_size // 2), kernel_size // 2 + 1)
         for dy in range(-(kernel_size // 2), kernel_size // 2 + 1)
         for dz in range(-(kernel_size // 2), kernel_size // 2 + 1)],
        dtype=np.int32,
    )
    skey, order = _downsample_sort(level.off, level.valid, stride=stride)
    uoff, ukey, uvalid, ucount, parent_idx, parent_ok, octant = jax.vmap(
        partial(_downsample_one, capacity=capacity, stride=stride)
    )(level.off, level.valid, skey, order)
    child_idx, child_hit, child_tiled = _child_tables(
        uoff, ukey, uvalid, level.key, offsets, stride=stride)
    up_tiled = None
    if (stride == 2 and _current_impl() in ("pallas", "pallas-int8")
            and level.key.shape[1] % 8 == 0):
        up_tiled = _up_tiled_maps(parent_idx, parent_ok, octant,
                                  level.valid, capacity)
    fine = dataclasses.replace(level, parent_idx=parent_idx,
                               parent_ok=parent_ok, octant=octant,
                               up_tiled=up_tiled)
    coarse = Level(off=uoff, key=ukey, valid=uvalid, count=ucount,
                   child_idx=child_idx, child_hit=child_hit,
                   child_tiled=child_tiled)
    if build_k3:
        nbr_idx, nbr_hit, nbr_tiled = _neighbor_tables(
            coarse.off, coarse.key, coarse.valid, K3_OFFSETS)
        coarse = dataclasses.replace(coarse, nbr_idx=nbr_idx,
                                     nbr_hit=nbr_hit, nbr_tiled=nbr_tiled)
    return fine, coarse
