"""Pallas windowed gather-GEMM sparse convolution (the TPU hot kernel).

Replaces the XLA take_along_axis gathers of ``mrcc_tpu.sparse.conv``
(27 per k=3 conv), which run at ~10-15 ns/row on TPU — ~100x off roofline —
and cost one serialized HLO op each (~90 us/op measured on this runtime).

Key structural fact exploited: kernel-map indices are MONOTONE.  Neighbour
tables come from ``searchsorted(sorted_keys, sorted_keys + delta)``
(sparse/hierarchy.py), so for every kernel offset k, ``idx[k, b, :]`` is
non-decreasing.  A tile of T consecutive output rows therefore reads from a
narrow contiguous window of input rows (average width ~T), which this
kernel DMA-slices out of a VMEM-resident feature table and gathers with a
one-hot matmul on the MXU:

  for each offset k:   g_k = onehot(idx_k - start_k) @ feats[start_k : +W]
  out_tile = concat_k(g_k) @ concat_k(W_k)          (ONE big MXU GEMM)

The per-offset dots are independent (no accumulation chain — they write
disjoint slices of a scratch buffer), so the MXU pipelines them at
throughput rather than latency.  Exactness is unconditional: tiles whose
index span exceeds W loop over as many additional window chunks as needed
(dynamic fori_loop; chunk membership is disjoint by construction).

Weight/VMEM budget: offsets are processed in groups of KG (sized so the
[T, KG*C] scratch and [KG*C, Cout] weight block fit VMEM); the output tile
is revisited across groups and accumulated in place.

One pallas_call per convolution = ONE HLO op for what was ~110.

Reference semantics matched: ME.MinkowskiConvolution kernel maps
(minkunet.py:55-121) — oracle-tested against sparse/conv.py in
tests/test_conv_pallas.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# Lane budget for the [T, KG*C] gather scratch and the [KG*C, Cout] weight
# block.  Sized so kg == K always holds after channel splitting (27 * 128):
# with ONE offset group the weight block's index map is constant and Mosaic
# keeps the weights VMEM-resident for the whole grid.  Round-2's kg cap of
# 2048 lanes split offsets into n_kg >= 2 groups whose 1-2 MB weight blocks
# re-DMA'd EVERY grid step — measured 30 of the 40 ms of each channel-split
# decoder conv (scripts/bench_unet_convs.py marginal profile, round 3).
_KG_LANES = 3456


def _choose_kg(k: int, cin: int, kg_lanes: int = _KG_LANES) -> int:
    """Offset-group size (kg == k whenever k * cin <= kg_lanes)."""
    kg = max(1, min(k, kg_lanes // max(cin, 1)))
    return kg


# Misses are ENCODED IN THE INDEX (idx = _MISS) instead of a separate hit
# table: one fewer VPU op per one-hot build, half the map traffic, and the
# chunk-partition conditions reject _MISS rows for free (hugely negative
# local offsets never land in any [ci*W, (ci+1)*W) range).
_MISS = -(1 << 30)


def _pick_tile(n: int) -> int:
    # prefer 256-row tiles: per-grid-step orchestration was measured at
    # ~2-3 us/step (scripts: /tmp probe decomposition, round 3) — halving
    # the step count is ~1 ms/call on the big levels.  MRCC_CONV_TILE
    # caps the tile for experiments: window width is T + slack, so gather
    # FLOPs per output row scale with (T + slack)/T — smaller tiles trade
    # orchestration steps for narrower windows (r5 probe).
    cap = int(os.environ.get("MRCC_CONV_TILE", "256"))
    for t in (256, 128, 64, 32, 16, 8):
        if t <= cap and n % t == 0 and n >= t:
            return t
    return 0


def default_window(t: int, n: int) -> int:
    """Canonical window width for tile size t over an n-row table (shared
    with ops/rank_pallas.py so level-cached maps are reusable by convs).

    W = T + 64: a tile of T monotone same-density indices spans ~T rows;
    starts are aligned down to 32, so 64 rows of slack cover the alignment
    plus typical density variation, and the chunk loop guarantees
    exactness for the tail of wider-span tiles.  (W = T + 128 paid 17%
    more gather FLOPs on every offset to shave chunk-loop iterations that
    occur on only a few (offset, tile) pairs; W = 2T before that paid
    double.)  MRCC_CONV_WSLACK overrides the slack for experiments
    (exactness is unconditional either way — only the chunk-loop
    frequency moves)."""
    slack = int(os.environ.get("MRCC_CONV_WSLACK", "64"))
    n8 = n - (n % 8)
    return max(8, min(max(t + slack, 128), n8))


def packed_window(t: int, pack: int, n_p: int) -> int:
    """Window width over a lane-packed table (``n_p = n // pack`` rows).

    A T-row monotone tile spans ~T/pack packed rows; 128 rows of slack
    absorb the 32-aligned start.  Multiple-of-32 (packed starts are
    32-aligned and clamped to n_p - w)."""
    w = -(-(t // pack + 128) // 32) * 32
    return max(32, min(w, n_p - (n_p % 32)))


@functools.partial(
    jax.jit,
    static_argnames=("t", "w", "kg", "n_out", "cout", "out_dtype",
                     "pack", "w_raw", "identity_k", "bcast_k", "n_cg"))
def _gather_gemm_call(idx_t, starts, nchunks, feats, w_grp,
                      t, w, kg, n_out, cout, out_dtype,
                      pack=1, w_raw=None, identity_k=None, bcast_k=False,
                      n_cg=1):
    """The pallas_call wrapper (all shapes static).

    idx_t: [B, nt, KP, T] int32, misses = _MISS (KP >= n_groups*kg,
      padding offsets all-_MISS).  RAW row indices even when pack > 1.
    starts/nchunks: [KP*B*nt] int32 scalar-prefetch (window start, aligned
      down to 8 and clamped to [0, N-W]; number of W-chunks covering the
      tile's hit-index span).  Always in RAW rows / RAW window units
      (``w_raw``) — the packed equivalents are derived in-kernel, so tiled
      maps cache once per level regardless of each conv's pack factor.
    feats: [B, N, n_cg * Cblk] (bf16/f32), CHANNEL-GROUP-MAJOR: group cg's
      table is feats[..., cg*Cblk:(cg+1)*Cblk].  Channel groups are a GRID
      dimension (innermost): every group's contribution accumulates in a
      VMEM f32 scratch and the output block is written ONCE — no per-group
      HBM output round-trips, map blocks fetched once per tile.  When
      pack > 1 each group's Cblk = pack*c_g lanes are LANE-PACKED: packed
      row q holds raw rows q*pack..q*pack+pack-1 at lane groups of c_g
      channels each, and the one-hot gathers whole packed rows, masked
      down to the per-output-row sub-row group afterwards (the weights
      are group-tiled by the caller so no lane shuffle is needed).
    w_grp: [n_kg * n_cg, kg*Cblk, Cout] (feats dtype), kgi-major cg-minor.
    identity_k: static offset index whose map is the identity (k=3 s=1
      delta (0,0,0): rank(key_i + 0) == i, always hit on valid rows) —
      its gather is a direct window slice, no one-hot dot.  Requires
      n == n_out and table padding rows to be exactly zero (the sparse
      core's invariant).  pack == 1 only.
    bcast_k: static; the offsets of every group share ONE index vector
      (octant/up maps: idx_k = parent_idx for all k, misses select the
      octant).  Gather once per group with union-span scalars (see
      build_tiled_maps ``span_hit``), then ONE wide GEMM against the
      octant-minor restacked weights w_grp[gi]: [Cblk, kg*Cout] — kg x
      the output columns of the concat formulation (narrow-N dots are
      the measured wall) — followed by a disjoint-masked octant select.
    Returns [B, n_out, Cout] ``out_dtype``.
    """
    b, n, c_all = feats.shape
    assert c_all % n_cg == 0
    c = c_all // n_cg                                  # per-group lanes
    nt = n_out // t
    n_kg = w_grp.shape[0] // n_cg
    kp = idx_t.shape[2]
    n_grid = n_kg * n_cg
    assert n_kg * kg <= kp
    if identity_k is not None and pack == 1:
        assert n == n_out, (n, n_out)  # identity rows are the tile's own
    if pack > 1:
        assert n % 32 == 0 and w % 32 == 0 and w_raw is not None
        assert c % pack == 0
    shift = pack.bit_length() - 1
    c_sub = c // pack
    align = 32 if pack > 1 else 8

    def kernel(starts_ref, nchunks_ref, idx_ref, feats_ref, w_ref,
               out_ref, gall_ref, acc_ref):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        gi = pl.program_id(2)
        kgi = gi // n_cg
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (t, w), 1)
        if pack > 1:
            lane_grp = jax.lax.broadcasted_iota(
                jnp.int32, (t, c), 1) // c_sub

        def gather_one(k):
            """Windowed one-hot gather for offset k's index row (chunk
            loop makes arbitrary spans exact; see gather_union)."""
            return gather_union(idx_ref[0, 0, k, :], k)

        def gather_union(idxv, k_scal):
            """gather_one with an explicit index vector (union of the
            group's rows; scalars from slot k_scal)."""
            flat = (k_scal * pl.num_programs(0) + bi) * nt + ti
            st_raw = starts_ref[flat]
            nch_raw = nchunks_ref[flat]
            if pack > 1:
                stp0 = st_raw >> shift
                st = jnp.maximum(stp0 - stp0 % 32, 0)
                st = jnp.minimum(st, n - w)
                bound = (stp0 - st) + (nch_raw * w_raw) // pack + 1
                nch = bound // w + 1
                local0 = (idxv >> shift) - st
                rbits = jax.lax.bitwise_and(idxv, pack - 1)
            else:
                st = st_raw
                nch = nch_raw
                local0 = idxv - st
            base = local0[:, None] == iota_w
            window0 = feats_ref[0, pl.ds(pl.multiple_of(st, align), w), :]
            g = jnp.dot(base.astype(window0.dtype), window0,
                        preferred_element_type=jnp.float32)

            def chunk_body(ci, acc):
                wst = pl.multiple_of(jnp.minimum(st + ci * w, n - w), align)
                lo = local0[:, None] - (wst - st)
                oh = ((lo == iota_w)
                      & (local0[:, None] >= ci * w)
                      & (local0[:, None] < (ci + 1) * w))
                win = feats_ref[0, pl.ds(wst, w), :]
                return acc + jnp.dot(oh.astype(win.dtype), win,
                                     preferred_element_type=jnp.float32)

            g = jax.lax.fori_loop(1, nch, chunk_body, g)
            if pack > 1:
                g = jnp.where(lane_grp == rbits[:, None], g, 0.0)
            return g

        # the identity/bcast shortcuts need STATIC offset indices, so they
        # are only enabled when n_kg == 1 (k == j at compile time — the
        # universal case by _split_plan; wrappers enforce the gate)
        if bcast_k:
            # octant/up maps: all real offsets in the group share the same
            # index vector; misses select the octant.  Gather ONCE (union
            # scalars from build_tiled_maps span_hit), then ONE WIDE GEMM
            # [T, C] x [C, kg*Cout] (the caller restacks the weights
            # octant-minor): same FLOPs as the old masked-copies-into-gall
            # formulation but kg x the output columns — narrow-N dots are
            # the measured throughput wall (N=128 ~25 TF/s at any M; the
            # column-tile law).  Octant selection is kg disjoint-masked
            # adds on [T, Cout] (VPU noise).
            idx_u = idx_ref[0, 0, 0, :]
            for j in range(1, kg):
                idx_u = jnp.maximum(idx_u, idx_ref[0, 0, j, :])
            g_u = gather_union(idx_u, 0)
            wide = jnp.dot(g_u.astype(w_ref.dtype), w_ref[0],
                           preferred_element_type=jnp.float32)
            contrib = jnp.zeros((t, cout), jnp.float32)
            for j in range(kg):
                hit_j = idx_ref[0, 0, j, :][:, None] >= 0
                contrib = contrib + jnp.where(
                    hit_j, wide[:, j * cout:(j + 1) * cout], 0.0)
        else:
            for j in range(kg):
                if (identity_k is not None and pack == 1 and n_kg == 1
                        and j == identity_k):
                    # compile-time branch: the identity offset copies the
                    # tile's own rows (table padding rows are zero, missing
                    # rows are masked by idx >= 0)
                    idxv = idx_ref[0, 0, j, :]
                    rows = feats_ref[0, pl.ds(ti * t, t), :]
                    gall_ref[:, j * c:(j + 1) * c] = jnp.where(
                        idxv[:, None] >= 0, rows, 0
                    ).astype(gall_ref.dtype)
                    continue
                k = kgi * kg + j
                gall_ref[:, j * c:(j + 1) * c] = gather_one(k).astype(
                    gall_ref.dtype)

        if not bcast_k:
            contrib = jnp.dot(gall_ref[:, :].astype(w_ref.dtype), w_ref[0],
                              preferred_element_type=jnp.float32)

        if n_grid == 1:
            out_ref[0, :, :] = contrib.astype(out_ref.dtype)
        else:
            # accumulate every offset/channel group in f32 VMEM; the
            # output block is written once, at the last group (no HBM
            # partial-sum round-trips, exact f32 accumulation)
            @pl.when(gi == 0)
            def _():
                acc_ref[:, :] = contrib

            @pl.when(gi != 0)
            def _():
                acc_ref[:, :] = acc_ref[:, :] + contrib

            @pl.when(gi == n_grid - 1)
            def _():
                out_ref[0, :, :] = acc_ref[:, :].astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nt, n_grid),
        in_specs=[
            pl.BlockSpec((1, 1, kp, t), lambda bi, ti, gi, s1, s2:
                         (bi, ti, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda bi, ti, gi, s1, s2:
                         (bi, 0, gi % n_cg), memory_space=pltpu.VMEM),
            (pl.BlockSpec((1, c, kg * cout), lambda bi, ti, gi, s1, s2:
                          (gi, 0, 0), memory_space=pltpu.VMEM)
             if bcast_k else
             pl.BlockSpec((1, kg * c, cout), lambda bi, ti, gi, s1, s2:
                          (gi, 0, 0), memory_space=pltpu.VMEM)),
        ],
        out_specs=pl.BlockSpec((1, t, cout), lambda bi, ti, gi, s1, s2:
                               (bi, ti, 0), memory_space=pltpu.VMEM),
        # wide (bcast) mode never touches the gall scratch — keep it tiny
        scratch_shapes=[pltpu.VMEM((8, 128) if bcast_k else (t, kg * c),
                                   feats.dtype),
                        pltpu.VMEM((t, cout), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_out, cout), out_dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(starts, nchunks, idx_t, feats, w_grp)


# VMEM-resident feature-table budget (bytes).  Mosaic double-buffers the
# per-item table block, so ~2x this plus weight/scratch blocks must fit in
# the 16 MB VMEM (measured: 8.2 MB tables OOM, 5.1 MB compile).
_TABLE_BUDGET = 5 * 1024 * 1024


def _split_plan(n, c, k, kp, itemsize):
    """Channel-group / offset-group / lane-pack plan shared by the forward,
    q8 and dW kernels.

    Channels split so that (a) the per-item table slice fits the VMEM
    budget AND (b) all K offset weights fit one resident block
    (k * c_g <= _KG_LANES, so n_kg == 1 on every real shape).

    When even the 128-lane floor exceeds the table budget (production-scale
    levels: 72k voxels x 128 padded lanes x bf16 = 18 MB), the plan LANE-
    PACKS ``pack`` consecutive table rows into the 128-lane word
    (c_g = 128 // pack real channels per group): the table shrinks
    ``pack``-fold AND the gather windows narrow ~``pack``-fold.  See
    :func:`_gather_gemm_call` for the in-kernel sub-row selection.

    Returns (c_g, n_cg, c_pad, kg, n_kg, pack)."""
    c_g = c
    # (b) weight residency: bound k * c_g (scratch/weight bytes scale with
    # itemsize, so int8 affords twice the lanes of bf16).  MRCC_KG_LANES_Q8
    # overrides the int8 budget for width experiments (e.g. 10368 lets the
    # c384 decoder run full-width, n_cg=1 — VMEM-borderline, probe first).
    kg_lanes = (int(os.environ.get("MRCC_KG_LANES_Q8", _KG_LANES * 2))
                if itemsize == 1 else _KG_LANES)
    c_lane = max(128, (kg_lanes // max(k, 1)) // 128 * 128)
    if k * c_g > kg_lanes:
        c_g = min(c_g, c_lane)
    # (a) table budget
    if n * _padded_lanes(c_g) * itemsize > _TABLE_BUDGET:
        c_g = min(c_g, max(128, (_TABLE_BUDGET // (n * itemsize))
                           // 128 * 128))

    def _packable(p):
        return (n % (32 * p) == 0 and n // p >= 128
                and (n // p) * 128 * itemsize <= _TABLE_BUDGET)

    pack = 1
    over = n * 128 * itemsize > _TABLE_BUDGET
    # alignment/density choices are PERF-ONLY (VMEM lane padding and MXU
    # K-tiling exist on hardware, not in interpret mode) — skip them on
    # CPU so the oracle suite doesn't pay padded/packed XLA FLOPs.  The
    # budget-REQUIRED pack below applies everywhere (tests force it by
    # shrinking the budget).  MRCC_CONV_PLAN=plain is the escape hatch to
    # the round-2 plan shapes on hardware.
    perf_shapes = (not _interpret()
                   and os.environ.get("MRCC_CONV_PLAN", "") != "plain")
    if c_g <= 64 and not over and perf_shapes:
        # narrow channels: pack to a DENSE 128-lane block in one group —
        # the gather windows narrow ~pack-fold and the concat GEMM's K
        # becomes 128-aligned (K=2592 measured 2x slower than K=3456,
        # scripts/probe_gemm_shape.py)
        sub = 32 if c_g <= 32 else 64
        if _packable(128 // sub):
            pack = 128 // sub
            c_g = sub
    elif over:
        # over the VMEM table budget even at the 128-lane floor
        # (production-scale levels): packing is REQUIRED.  Smallest pack
        # that fits -> fewest channel groups (the GEMM dominates the step).
        for p in (2, 4):
            if _packable(p):
                pack = p
                break
        if pack == 1:
            raise ValueError(f"table n={n} over budget even lane-packed"
                             " (gate with supported() first)")
        c_g = 128 // pack
    if pack == 1 and c_g % 128 and perf_shapes:
        # align the concat GEMM: pad the lane block to 128 (physically
        # free — VMEM pads the table to 128 lanes either way)
        c_g = _padded_lanes(c_g)
    n_cg = -(-c // c_g)
    c_pad = n_cg * c_g
    kg = min(_choose_kg(k, c_g * pack, kg_lanes), kp)
    n_kg = -(-k // kg)
    while n_kg * kg > kp:  # respect the map's KP padding
        kg -= 1
        n_kg = -(-k // kg)
    return c_g, n_cg, c_pad, kg, n_kg, pack


def build_tiled_maps(nbr_idx, nbr_hit, n, t=None, w_width=None, kp=None,
                     span_hit=None):
    """Tiled kernel-map layout + per-(k, b, tile) window scalars.

    Returns (idx_t [B, nt, KP, T] with misses = _MISS, starts [KP*B*nt],
    nchunks).  Cache this per hierarchy level — every conv on the level
    shares it (t is implied by idx_t's last dim; w by
    :func:`default_window`).

    ``span_hit`` (optional [K, B, N]): hits to compute the window scalars
    over, when wider than ``nbr_hit``.  Broadcast (octant) maps pass the
    any-octant union here so every offset's scalars cover the shared
    gather window (kernel ``bcast_k`` mode gathers once per group).
    """
    k, b, n_out = nbr_idx.shape
    t = t or _pick_tile(n_out)
    w_width = w_width or default_window(t, n)
    nt = n_out // t
    kp = kp or max(8, -(-k // 8) * 8)

    idx_r = nbr_idx.reshape(k, b, nt, t)
    hit_r = nbr_hit.reshape(k, b, nt, t)
    span_r = (hit_r if span_hit is None
              else span_hit.reshape(k, b, nt, t))
    lo = jnp.where(span_r, idx_r, n - 1).min(axis=-1)     # [k, b, nt]
    hi = jnp.where(span_r, idx_r, 0).max(axis=-1)
    # 32-aligned starts: int8 sublane granularity (bf16 needs only 8)
    starts = jnp.minimum(lo - (lo % 32), jnp.maximum(n - w_width, 0))
    starts = jnp.maximum(starts, 0)
    span = jnp.maximum(hi - starts, 0)
    nchunks = span // w_width + 1

    idxh_r = jnp.where(hit_r, idx_r, _MISS)

    def pad_k(a, fill=0):
        return jnp.pad(a, ((0, kp - k),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)

    idx_t = pad_k(idxh_r, _MISS).transpose(1, 2, 0, 3)    # [B, nt, KP, T]
    starts_f = pad_k(starts).reshape(-1).astype(jnp.int32)
    nchunks_f = jnp.maximum(pad_k(nchunks), 1).reshape(-1).astype(jnp.int32)
    return idx_t, starts_f, nchunks_f


def gather_gemm_conv_tiled(feats, weights, tiled, out_valid, bias=None,
                           k=None, w_width=None, identity_k=None,
                           bcast_k=False):
    """Conv on a precomputed tiled map (see :func:`build_tiled_maps`).

    ``w_width`` must match the width the map's nchunks were computed for
    (defaults to :func:`default_window`, the shared convention).
    ``identity_k``/``bcast_k``: see :func:`_gather_gemm_call`."""
    idx_t, starts_f, nchunks_f = tiled
    b, n, c = feats.shape
    t = idx_t.shape[3]
    w_width = w_width or default_window(t, n)
    k = k or weights.shape[0]
    kp = idx_t.shape[2]
    n_out = idx_t.shape[1] * t
    cout = weights.shape[-1]

    itemsize = jnp.dtype(feats.dtype).itemsize
    if (_stream_enabled() and not bcast_k
            and n * 128 * itemsize > _TABLE_BUDGET):
        # over-budget table: stream windows from HBM instead of lane-
        # packing the resident table (no pack compares, no group split)
        return gather_gemm_conv_streamed(feats, weights, tiled, out_valid,
                                         bias=bias, k=k, w_width=w_width)
    c_g, n_cg, c_pad, kg, n_kg, pack = _split_plan(n, c, k, kp, itemsize)

    if c_pad > c:
        feats = jnp.pad(feats, ((0, 0), (0, 0), (0, c_pad - c)))
        weights = jnp.pad(weights, ((0, 0), (0, c_pad - c), (0, 0)))

    w_full = jnp.pad(weights.astype(feats.dtype),
                     ((0, n_kg * kg - k), (0, 0), (0, 0)))
    b = feats.shape[0]
    w_call = packed_window(t, pack, n // pack) if pack > 1 else w_width
    # The channel-group GRID fold (n_cg as a kernel grid dim with VMEM
    # accumulation) only pays when it is free: with n_cg > 1 the table and
    # weight block indices change EVERY grid step, so Mosaic double-buffers
    # both (measured: VMEM OOM at the int8 c384 decoder, and a ~6% bf16
    # regression from per-step table re-streaming).  Multi-group shapes
    # keep the per-group pallas_call loop: constant-index weights stay
    # single-buffered and the table block is fetched once per item.
    out = None
    out_dtype = feats.dtype if n_kg == 1 else jnp.float32
    wide = bcast_k and n_kg == 1
    for cg in range(n_cg):
        f_sl = feats[:, :, cg * c_g:(cg + 1) * c_g]
        w_sl = w_full[:, cg * c_g:(cg + 1) * c_g, :]
        if wide:
            # octant-minor restack for the wide bcast GEMM:
            # [kg, Cg, Cout] -> [Cg, kg*Cout]
            w_sl = w_sl.transpose(1, 0, 2).reshape(c_g, kg * cout)
            if pack > 1:
                f_sl = f_sl.reshape(b, n // pack, pack * c_g)
                w_sl = jnp.tile(w_sl, (pack, 1))
            w_sl = w_sl[None]
        else:
            if pack > 1:
                # lane-pack the table; tile the weights over the lane
                # groups so masked packed gathers feed the GEMM without a
                # lane shuffle
                f_sl = f_sl.reshape(b, n // pack, pack * c_g)
                w_sl = jnp.tile(w_sl, (1, pack, 1))
            w_sl = w_sl.reshape(n_kg, kg * pack * c_g, cout)
        contrib = _gather_gemm_call(idx_t, starts_f, nchunks_f, f_sl,
                                    w_sl, t=t, w=w_call, kg=kg, n_out=n_out,
                                    cout=cout, out_dtype=out_dtype,
                                    pack=pack, w_raw=w_width,
                                    identity_k=(identity_k
                                                if pack == 1 and n_kg == 1
                                                else None),
                                    bcast_k=wide)
        out = contrib if out is None else out + contrib
    out = out.astype(feats.dtype)
    if bias is not None:
        out = out + bias.astype(feats.dtype)
    return jnp.where(out_valid[..., None], out, 0)


def gather_gemm_conv(feats, weights, nbr_idx, nbr_hit, out_valid, bias=None,
                     t=None, w_width=None):
    """Sparse conv via the Pallas windowed kernel.

    Drop-in equivalent of ``sparse.conv.conv_kernel_map`` (same arguments /
    semantics): out[i] = sum_k hit[k,i] * feats[idx[k,i]] @ W[k].

    Tables over the VMEM budget are processed in channel groups (the maps
    are shared; one kernel call per group, summed — exact).
    """
    n = feats.shape[1]
    t = t or _pick_tile(nbr_idx.shape[-1])
    w_width = w_width or default_window(t, n)
    tiled = build_tiled_maps(nbr_idx, nbr_hit, n, t=t, w_width=w_width)
    return gather_gemm_conv_tiled(feats, weights, tiled, out_valid,
                                  bias=bias, k=nbr_idx.shape[0],
                                  w_width=w_width)


def _padded_lanes(c: int) -> int:
    """VMEM lane padding: blocks occupy round_up(C, 128) lanes."""
    return max(128, -(-c // 128) * 128)


# ------------------------------------------------------ self-keyed k3 path
#
# The k=3 s=1 conv without precomputed neighbour tables (ROADMAP r5 #1).
# The windowed one-hot of the table path is ``(idx - start) == iota``; but
# idx itself came from the rank kernel comparing sorted keys against
# ``key + delta`` — the SAME [T, W] compare.  So the conv can build its
# one-hot directly from the level's sorted keys:
#
#   onehot[i, p] = (window_keys[p] == key_tile[i] + delta_k) & valid_k[i]
#
# which removes the per-level rank-kernel table build entirely (~28 ms of
# the B=8/16k pipeline, scripts/probe_k3_pieces.py).  Costs vs the table
# path: key-window lane slices force 128-aligned window starts (W = T +
# 128 instead of T + 64 -> ~20% more gather FLOPs).  Border validity
# travels as a per-row 27-bit bitmap (border queries alias real coords
# across the arithmetic key fields, so the compare alone is not
# sufficient).
#
# LANE-PACKED self-keying (round 5; the r4 blocker): the packed one-hot
# needs the sub-row index of each match, which the table path reads off
# ``idx & (pack-1)``.  Self-keyed, the keys are restacked SUB-MAJOR
# ([B, pack, N/pack]: vector s holds raw rows s, s+pack, ...), the
# compare runs once per sub over the PACKED window, the per-sub hits are
# OR-merged for ONE packed gather dot, and the sub index is recovered as
# the row-sum of ``sum_s s*oh_s`` (keys are unique, so at most one
# (sub, position) matches).  Packing serves two independent purposes,
# exactly as in the table plan (_split_plan): density for narrow convs
# (c <= 64 packs to a 128-lane block, windows shrink ~pack-fold) and
# RESIDENCY for production-scale levels (the packed table fits the VMEM
# budget where the 128-lane one does not — bf16 to ~80k voxels at pack 4,
# int8 to ~160k).
#
# TRAINING (round 5): submanifold k3 adjacency is symmetric under delta
# negation and K3_OFFSETS[26-k] == -K3_OFFSETS[k], so the backward data
# cotangent is the SAME self-keyed conv with W'[k] = W[26-k]^T — the
# validity bitmap is reused verbatim (a hit (i, k) exists iff the hit
# (i+d_k, 26-k) exists: both endpoints are real in-range voxels).  dW
# accumulates gather_k(feats)^T @ g with the same key-compare gather
# (:func:`_dw_call_sk`).  ``pallas_conv_sk_op`` wires both as a
# custom_vjp, so trainers self-key too (reference hot loop
# train.py:39-151).


def sk_window(t: int, n: int) -> int:
    """Self-keyed window width: starts are 128-aligned (key LANE slices),
    so the slack must absorb up to 127 alignment rows."""
    n128 = n - (n % 128)
    return max(128, min(t + 128, n128))


def sk_window_packed(t: int, pack: int, n_p: int) -> int:
    """Window width over a sub-major packed key/table pair (``n_p = n //
    pack`` rows): a T-row monotone tile spans ~T/pack packed rows, plus up
    to 127 rows of 128-alignment slack; multiples of 128 (lane slices)."""
    w = -(-(t // pack + 128) // 128) * 128
    return max(128, min(w, n_p - (n_p % 128)))


def sk_pack(n: int, itemsize: int = 2):
    """Smallest lane-pack factor at which the self-keyed route handles an
    ``n``-row table (1 = unpacked fits), or None if unsupported.

    Requirements per pack p: n/p divisible by 128 (packed key vectors are
    lane-sliced at 128-aligned starts), and the (n/p)x128-lane table fits
    the VMEM budget."""
    if n % 128 or n < 128 or _pick_tile(n) < 128:
        return None
    for p in (1, 2, 4):
        n_p = n // p
        if (n % (128 * p) == 0 and n_p >= 128
                and n_p * 128 * itemsize <= _TABLE_BUDGET):
            return p
    return None


def sk_supported(n: int, itemsize: int = 2) -> bool:
    """Self-keyed route gate (packed capacities included)."""
    return sk_pack(n, itemsize) is not None


def _sk_plan(n, c, itemsize):
    """(c_g, n_cg, pack) for one self-keyed conv: 128-lane channel groups;
    pack = required residency pack, raised for narrow-channel density on
    hardware (same perf-only rule as _split_plan)."""
    pack = sk_pack(n, itemsize)
    assert pack is not None, (n, itemsize)
    # NO density packing by default (unlike _split_plan): a packed sk conv
    # runs ``pack`` window-key compares + a sub-index row-sum per offset
    # where the packed TABLE conv runs one compare on the shifted index —
    # measured net-negative (headline bench 40.7 -> 39.7 with density
    # packs; production probe_prod_sk).  MRCC_SK_DENSITY=1 re-enables for
    # experiments.
    if (pack == 1 and c <= 64 and not _interpret()
            and os.environ.get("MRCC_SK_DENSITY", "0") == "1"):
        sub = 32 if c <= 32 else 64
        p = 128 // sub
        if n % (128 * p) == 0 and n // p >= 128:
            pack = p
    c_g = min(_padded_lanes(c), 128) // pack if pack > 1 else min(
        _padded_lanes(c), 128)
    n_cg = -(-c // c_g)
    return c_g, n_cg, pack


def _sk_gather_factory(t, w, n_raw, w_raw, pack, n_p, deltas):
    """Shared self-keyed windowed-gather builder for the fwd/q8/dW kernels.

    Returns ``gather(j, qk, kb, starts_ref, nchunks_ref, kpk_ref,
    feats_ref, flat, acc_dtype)`` producing the [T, C] gather for offset
    ``j`` (C = pack * c_g lanes).  ``acc_dtype`` selects f32 (float paths)
    or int32 (int8 path) chunk accumulation; the packed sub-row lane mask
    is applied before returning."""
    shift = pack.bit_length() - 1

    def gather(j, qk, kb, starts_ref, nchunks_ref, kpk_ref, feats_ref,
               flat, acc_dtype):
        # Mosaic: i1 vectors cannot take a minor dim — reshape the int32
        # bit vector and compare in 2D (verify-skill gotcha)
        qv2 = (((kb >> j) & 1)[:, None]) != 0                # [T, 1]
        q = qk + int(deltas[j])
        st_raw = starts_ref[flat]
        nch_raw = nchunks_ref[flat]
        if pack > 1:
            stp0 = st_raw >> shift
            st = jnp.maximum(stp0 - stp0 % 128, 0)
            st = jnp.minimum(st, n_p - w)
            bound = (stp0 - st) + ((nch_raw * w_raw) >> shift) + 1
            nch = bound // w + 1
        else:
            st = st_raw
            nch = nch_raw
        c = feats_ref.shape[-1]

        def compare(wst, seg):
            """OR-merged per-sub one-hot over window [wst, wst+w) plus the
            matching sub-index row-sum (packed), or the plain compare."""
            if pack == 1:
                wk = kpk_ref[0, 0, pl.ds(wst, w)]
                oh = (wk[None, :] == q[:, None]) & qv2
                if seg is not None:
                    oh = oh & seg
                return oh, None
            ohc = None
            rbm = None
            for s in range(pack):
                wk = kpk_ref[0, s, pl.ds(wst, w)]
                oh_s = (wk[None, :] == q[:, None]) & qv2
                if seg is not None:
                    oh_s = oh_s & seg
                ohc = oh_s if ohc is None else (ohc | oh_s)
                if s:
                    m = oh_s.astype(jnp.int32) * s
                    rbm = m if rbm is None else rbm + m
            # keys are unique: at most one (sub, position) matches, so the
            # row-sum IS the matching sub index (0 for misses — their
            # gather row is all-zero anyway)
            return ohc, jnp.sum(rbm, axis=1)

        wst0 = pl.multiple_of(st, 128)
        oh0, rb = compare(wst0, None)
        window0 = feats_ref[0, pl.ds(wst0, w), :]
        g = jnp.dot(oh0.astype(window0.dtype), window0,
                    preferred_element_type=acc_dtype)

        def chunk_body(ci, carry, q=q, qv2=qv2, st=st):
            # keys are unique, but clamped windows overlap — the POSITION
            # partition keeps the gather adds disjoint
            acc, rbacc = carry
            wst = pl.multiple_of(
                jnp.minimum(st + ci * w, (n_p if pack > 1 else n_raw) - w),
                128)
            iota = jax.lax.broadcasted_iota(jnp.int32, (t, w), 1)
            pos = wst + iota[0:1]                            # [1, W] int32
            seg = (pos >= st + ci * w) & (pos < st + (ci + 1) * w)
            ohc, rbc = compare(wst, seg)
            win = feats_ref[0, pl.ds(wst, w), :]
            acc = acc + jnp.dot(ohc.astype(win.dtype), win,
                                preferred_element_type=acc_dtype)
            if rbacc is not None:
                rbacc = rbacc + rbc
            return acc, rbacc

        if pack > 1:
            g, rb = jax.lax.fori_loop(1, nch, chunk_body, (g, rb))
            c_sub = c // pack
            lane_grp = jax.lax.broadcasted_iota(jnp.int32, (t, c), 1) // c_sub
            g = jnp.where(lane_grp == rb[:, None], g, 0)
        else:
            g, _ = jax.lax.fori_loop(1, nch, chunk_body, (g, None))
        return g

    return gather


def _sk_in_specs(n, n_p, pack, c_all):
    """Block specs shared by the self-keyed forward/q8 kernels:
    (keys, kpk, kbits, feats) — everything per-item VMEM-resident with
    constant index maps (single-buffered across the tile grid)."""
    return [
        pl.BlockSpec((1, 1, n), lambda bi, ti, s1, s2: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, pack, n_p), lambda bi, ti, s1, s2: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n), lambda bi, ti, s1, s2: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_p, c_all), lambda bi, ti, s1, s2: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


@functools.partial(
    jax.jit,
    static_argnames=("deltas", "t", "w", "cout", "out_dtype", "identity_k",
                     "pack", "w_raw"))
def _gather_gemm_call_sk(starts, nchunks, keys, kpk, kbits, feats, w_grp,
                         deltas, t, w, cout, out_dtype, identity_k=None,
                         pack=1, w_raw=None):
    """Self-keyed pallas_call: one channel group (pack*c <= 128 lanes).

    keys:  [B, 1, N] int32 sorted per item (KEY_PAD padding) — query keys.
    kpk:   [B, pack, N//pack] int32 sub-major window keys (== keys when
      pack == 1); kbits: [B, 1, N] int32 — bit k set iff the row's
      offset-k query is valid (in coordinate range on every axis AND the
      row itself is valid).
    starts/nchunks: [K*B*nt] int32 (k-major), RAW units, starts
      128-ALIGNED (packed equivalents are derived in-kernel so one
      build_sk_maps pack serves every conv pack on the level).
    feats: [B, N//pack, pack*C] (C real channels per packed sub-row);
    w_grp: [1, K*pack*C, Cout] (weights tiled over lane groups if packed).
    Submanifold: n_out == N (the query tile IS the key tile).
    """
    b, n_p, c_all = feats.shape
    n_win = kpk.shape[1] * kpk.shape[2]
    n_q = keys.shape[-1]
    k_real = len(deltas)
    nt = n_q // t
    w_raw = w_raw or w
    assert _interpret() or (t % 128 == 0 and w % 128 == 0
                            and n_win % 128 == 0 and n_q % 128 == 0)
    assert n_p * pack == n_win and c_all % pack == 0

    gather = _sk_gather_factory(t, w, n_win, w_raw, pack, n_p, deltas)

    def kernel(starts_ref, nchunks_ref, keys_ref, kpk_ref, kbits_ref,
               feats_ref, w_ref, out_ref, gall_ref):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        qk = keys_ref[0, 0, pl.ds(pl.multiple_of(ti * t, 128), t)]
        kb = kbits_ref[0, 0, pl.ds(pl.multiple_of(ti * t, 128), t)]

        for j in range(k_real):
            if identity_k == j and pack == 1:
                # delta == 0 resolves to the tile's own rows (padding rows
                # are zero by the sparse-core invariant; submanifold only)
                qv2 = (((kb >> j) & 1)[:, None]) != 0
                rows = feats_ref[0, pl.ds(ti * t, t), :]
                gall_ref[:, j * c_all:(j + 1) * c_all] = jnp.where(
                    qv2, rows, 0).astype(gall_ref.dtype)
                continue
            flat = (j * pl.num_programs(0) + bi) * nt + ti
            g = gather(j, qk, kb, starts_ref, nchunks_ref, kpk_ref,
                       feats_ref, flat, jnp.float32)
            gall_ref[:, j * c_all:(j + 1) * c_all] = g.astype(gall_ref.dtype)

        out_ref[0, :, :] = jnp.dot(
            gall_ref[:, :].astype(w_ref.dtype), w_ref[0],
            preferred_element_type=jnp.float32).astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nt),
        in_specs=_sk_in_specs(n_q, n_p, pack, c_all) + [
            pl.BlockSpec((1, k_real * c_all, cout), lambda bi, ti, s1, s2:
                         (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, cout), lambda bi, ti, s1, s2:
                               (bi, ti, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((t, k_real * c_all), feats.dtype)],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_q, cout), out_dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(starts, nchunks, keys[:, None, :], kpk, kbits[:, None, :], feats,
      w_grp)


@functools.partial(
    jax.jit,
    static_argnames=("deltas", "t", "w", "cout", "out_dtype", "identity_k",
                     "pack", "w_raw"))
def _gather_gemm_call_sk_q8(starts, nchunks, keys, kpk, kbits, feats_q,
                            w_q, vco, deltas, t, w, cout, out_dtype,
                            identity_k=None, pack=1, w_raw=None):
    """int8 self-keyed variant: one-hot gathers copy int8 table rows
    verbatim (exact), the concat GEMM runs int8 x int8 -> int32 on the MXU
    with ONE f32 per-output-column dequant scale (``vco`` [1, 1, Cout]).
    Same layout contract as :func:`_gather_gemm_call_sk`."""
    b, n_p, c_all = feats_q.shape
    n_win = kpk.shape[1] * kpk.shape[2]
    n_q = keys.shape[-1]
    k_real = len(deltas)
    nt = n_q // t
    w_raw = w_raw or w
    assert _interpret() or (t % 128 == 0 and w % 128 == 0
                            and n_win % 128 == 0 and n_q % 128 == 0)
    assert n_p * pack == n_win and c_all % pack == 0

    gather = _sk_gather_factory(t, w, n_win, w_raw, pack, n_p, deltas)

    def kernel(starts_ref, nchunks_ref, keys_ref, kpk_ref, kbits_ref,
               feats_ref, w_ref, vco_ref, out_ref, gall_ref):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        qk = keys_ref[0, 0, pl.ds(pl.multiple_of(ti * t, 128), t)]
        kb = kbits_ref[0, 0, pl.ds(pl.multiple_of(ti * t, 128), t)]

        for j in range(k_real):
            if identity_k == j and pack == 1:
                qv2 = (((kb >> j) & 1)[:, None]) != 0
                rows = feats_ref[0, pl.ds(ti * t, t), :]
                gall_ref[:, j * c_all:(j + 1) * c_all] = jnp.where(
                    qv2, rows, 0).astype(jnp.int8)
                continue
            flat = (j * pl.num_programs(0) + bi) * nt + ti
            g = gather(j, qk, kb, starts_ref, nchunks_ref, kpk_ref,
                       feats_ref, flat, jnp.int32)
            # one-hot rows copy table entries verbatim: stays int8
            gall_ref[:, j * c_all:(j + 1) * c_all] = g.astype(jnp.int8)

        gemm = jnp.dot(gall_ref[:, :], w_ref[0],
                       preferred_element_type=jnp.int32)
        out_ref[0, :, :] = (gemm.astype(jnp.float32)
                            * vco_ref[0, 0, :][None, :]).astype(
                                out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nt),
        in_specs=_sk_in_specs(n_q, n_p, pack, c_all) + [
            pl.BlockSpec((1, k_real * c_all, cout), lambda bi, ti, s1, s2:
                         (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cout), lambda bi, ti, s1, s2: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, cout), lambda bi, ti, s1, s2:
                               (bi, ti, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((t, k_real * c_all), jnp.int8)],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_q, cout), out_dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(starts, nchunks, keys[:, None, :], kpk, kbits[:, None, :], feats_q,
      w_q, vco)


def build_sk_maps(key, kbits, deltas, t=None, w_width=None):
    """Per-(offset, item, tile) window scalars for the self-keyed conv.

    key: [B, N] int32 sorted (KEY_PAD padding); kbits: [B, N] int32
    27-bit query-validity bitmap (see ops/rank_pallas.sk_bits); deltas:
    static [K] packed key deltas.  Returns (kbits, starts, nchunks) —
    cache per level, shared by every self-keyed conv on it.
    """
    deltas = tuple(int(d) for d in np.asarray(deltas).reshape(-1))
    k = len(deltas)
    b, n = key.shape
    t = t or _pick_tile(n)
    w = w_width or sk_window(t, n)
    nt = n // t

    # boundary ranks (rank of each tile's FIRST query per offset) — the
    # same size-gated compare-count/searchsorted pair as rank_lookup
    qb = key[:, ::t]                                          # [B, nt]
    deltas_arr = jnp.asarray(deltas, jnp.int32)
    queries = qb[None, :, :] + deltas_arr[:, None, None]      # [K, B, nt]
    flat_q = queries.transpose(1, 0, 2).reshape(b, k * nt)
    if k * nt * n <= (1 << 28):
        ranks = (key[:, None, :] < flat_q[:, :, None]).sum(
            axis=-1, dtype=jnp.int32)
    else:
        ranks = jax.vmap(lambda ky, qq: jnp.searchsorted(
            ky, qq, side="left", method="sort"))(key, flat_q)
    ranks = ranks.reshape(b, k, nt).transpose(1, 0, 2).astype(jnp.int32)
    ends = jnp.concatenate([ranks[:, :, 1:],
                            jnp.full((k, b, 1), n, jnp.int32)], axis=-1)
    # 128-aligned starts: the kernel slices the key LANE axis at st
    starts = jnp.clip(ranks - (ranks % 128), 0, max(n - w, 0))
    span = jnp.maximum(ends - starts, 0)
    nchunks = jnp.minimum(span // w + 1, -(-n // w))
    return (kbits.astype(jnp.int32),
            starts.reshape(-1).astype(jnp.int32),
            jnp.maximum(nchunks, 1).reshape(-1).astype(jnp.int32))


def _sk_prep(feats, weights, key, pack, c_g, n_cg):
    """Shared packed-layout prep for the sk conv wrappers: pad channels to
    the group grid, restack the window keys sub-major, and return
    per-group (feats-slice, weights-slice) generators' inputs."""
    b, n, c = feats.shape
    c_pad = n_cg * c_g
    if c_pad > c:
        feats = jnp.pad(feats, ((0, 0), (0, 0), (0, c_pad - c)))
        weights = jnp.pad(weights, ((0, 0), (0, c_pad - c), (0, 0)))
    if pack > 1:
        # sub-major packed key vectors: kpk[b, s, r] = key[b, r*pack + s]
        kpk = key.reshape(b, n // pack, pack).transpose(0, 2, 1)
    else:
        kpk = key[:, None, :]
    return feats, weights, kpk


def gather_gemm_conv_sk(feats, weights, key, sk, out_valid, deltas,
                        bias=None, identity_k=None, w_width=None,
                        pack=None):
    """Self-keyed k=3 s=1 conv (no neighbour tables).

    sk: (kbits, starts, nchunks) from :func:`build_sk_maps`.  Channels
    over the 128-lane block run as per-group calls on 128-lane slices
    (weights stay resident: K*128 = 3456 = _KG_LANES).  Lane packing per
    :func:`_sk_plan`: required for over-budget tables (production
    levels), optional for narrow-channel density; ``pack`` overrides
    (tests).  Differentiable via :func:`pallas_conv_sk_op`.
    """
    kbits, starts, nchunks = sk
    deltas = tuple(int(d) for d in np.asarray(deltas).reshape(-1))
    b, n, c = feats.shape
    k = weights.shape[0]
    assert k == len(deltas)
    t = _pick_tile(n)
    w_raw = w_width or sk_window(t, n)
    cout = weights.shape[-1]

    itemsize = jnp.dtype(feats.dtype).itemsize
    c_g, n_cg, plan_pack = _sk_plan(n, c, itemsize)
    pack = plan_pack if pack is None else pack
    if pack > 1:
        c_g = min(_padded_lanes(c), 128) // pack
        n_cg = -(-c // c_g)
    w = sk_window_packed(t, pack, n // pack) if pack > 1 else w_raw
    feats, weights, kpk = _sk_prep(feats, weights, key, pack, c_g, n_cg)
    weights = weights.astype(feats.dtype)

    out = None
    for cg in range(n_cg):
        f_sl = feats[:, :, cg * c_g:(cg + 1) * c_g]
        w_sl = weights[:, cg * c_g:(cg + 1) * c_g, :]
        if pack > 1:
            f_sl = f_sl.reshape(b, n // pack, pack * c_g)
            w_sl = jnp.tile(w_sl, (1, pack, 1))
        w_sl = w_sl.reshape(1, k * pack * c_g, cout)
        contrib = _gather_gemm_call_sk(
            starts, nchunks, key, kpk, kbits, f_sl, w_sl, deltas=deltas,
            t=t, w=w, cout=cout, out_dtype=feats.dtype,
            identity_k=identity_k, pack=pack, w_raw=w_raw)
        out = contrib if out is None else out + contrib
    if bias is not None:
        out = out + bias.astype(feats.dtype)
    return jnp.where(out_valid[..., None], out, 0)


def gather_gemm_conv_sk_q8(feats, weights, key, sk, out_valid, deltas,
                           bias=None, identity_k=None, w_width=None,
                           act_absmax=None, pack=None):
    """Quantized self-keyed conv (inference only): per-channel activation
    scales folded into the weights, per-output-column weight quantization,
    fully-int8 gather+GEMM — the sk twin of
    :func:`gather_gemm_conv_tiled_q8`.  int8 tables halve the residency
    budget, so production-scale levels (e.g. 131k voxels at pack 4) stay
    on-kernel."""
    kbits, starts, nchunks = sk
    deltas = tuple(int(d) for d in np.asarray(deltas).reshape(-1))
    b, n, c = feats.shape
    k = weights.shape[0]
    assert k == len(deltas)
    t = _pick_tile(n)
    w_raw = w_width or sk_window(t, n)
    cout = weights.shape[-1]

    f32 = feats.astype(jnp.float32)
    if act_absmax is None:
        act_absmax = jnp.abs(f32).max(axis=(0, 1))
    s_c = jnp.maximum(act_absmax.astype(jnp.float32), 1e-8) / 127.0  # [C]
    q_f = jnp.clip(jnp.round(f32 / s_c), -127, 127).astype(jnp.int8)
    w_fold = weights.astype(jnp.float32) * s_c[None, :, None]

    c_g, n_cg, plan_pack = _sk_plan(n, c, itemsize=1)
    pack = plan_pack if pack is None else pack
    if pack > 1:
        c_g = min(_padded_lanes(c), 128) // pack
        n_cg = -(-c // c_g)
    w = sk_window_packed(t, pack, n // pack) if pack > 1 else w_raw
    q_f, w_fold, kpk = _sk_prep(q_f, w_fold, key, pack, c_g, n_cg)

    out = None
    for cg in range(n_cg):
        f_sl = q_f[:, :, cg * c_g:(cg + 1) * c_g]
        w_sl = w_fold[:, cg * c_g:(cg + 1) * c_g, :]
        # per-output-column weight quantization, PER channel group
        m_co = jnp.maximum(jnp.abs(w_sl).max(axis=(0, 1)), 1e-12) / 127.0
        w_sl = jnp.clip(jnp.round(w_sl / m_co), -127, 127).astype(jnp.int8)
        if pack > 1:
            f_sl = f_sl.reshape(b, n // pack, pack * c_g)
            w_sl = jnp.tile(w_sl, (1, pack, 1))
        w_sl = w_sl.reshape(1, k * pack * c_g, cout)
        contrib = _gather_gemm_call_sk_q8(
            starts, nchunks, key, kpk, kbits, f_sl, w_sl,
            m_co[None, None, :], deltas=deltas, t=t, w=w, cout=cout,
            out_dtype=feats.dtype, identity_k=identity_k, pack=pack,
            w_raw=w_raw)
        out = contrib if out is None else out + contrib
    out = out.astype(feats.dtype)
    if bias is not None:
        out = out + bias.astype(feats.dtype)
    return jnp.where(out_valid[..., None], out, 0)


@functools.partial(
    jax.jit,
    static_argnames=("deltas", "t", "w", "cout", "pack", "w_raw"))
def _dw_call_sk(starts, nchunks, keys, kpk, kbits, feats, g,
                deltas, t, w, cout, pack=1, w_raw=None):
    """Self-keyed dW kernel: dw[k] = sum_{b,tiles} gather_k(feats)^T @ g.

    Same key-compare gather as the forward; the [K*C, Cout] output block
    has a constant index map, so it stays VMEM-resident and accumulates
    in place across the whole (b, tile) grid."""
    b, n_p, c_all = feats.shape
    n = keys.shape[-1]
    k_real = len(deltas)
    nt = n // t
    w_raw = w_raw or w
    assert n_p * pack == n and c_all % pack == 0

    gather = _sk_gather_factory(t, w, n, w_raw, pack, n_p, deltas)

    def kernel(starts_ref, nchunks_ref, keys_ref, kpk_ref, kbits_ref,
               feats_ref, g_ref, dw_ref):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        qk = keys_ref[0, 0, pl.ds(pl.multiple_of(ti * t, 128), t)]
        kb = kbits_ref[0, 0, pl.ds(pl.multiple_of(ti * t, 128), t)]

        @pl.when(jnp.logical_and(bi == 0, ti == 0))
        def _():
            dw_ref[:, :] = jnp.zeros_like(dw_ref[:, :])

        gt = g_ref[0, :, :]                                   # [T, Cout]
        for j in range(k_real):
            flat = (j * pl.num_programs(0) + bi) * nt + ti
            gath = gather(j, qk, kb, starts_ref, nchunks_ref, kpk_ref,
                          feats_ref, flat, jnp.float32)
            contrib = jax.lax.dot_general(
                gath.astype(gt.dtype), gt,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dw_ref[j * c_all:(j + 1) * c_all, :] = (
                dw_ref[j * c_all:(j + 1) * c_all, :] + contrib)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nt),
        in_specs=_sk_in_specs(n, n_p, pack, c_all) + [
            pl.BlockSpec((1, t, cout), lambda bi, ti, s1, s2: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_real * c_all, cout),
                               lambda bi, ti, s1, s2: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k_real * c_all, cout), jnp.float32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(starts, nchunks, keys[:, None, :], kpk, kbits[:, None, :], feats, g)


def dw_gather_gemm_sk(feats, g, key, sk, deltas, w_width=None, pack=None):
    """Weight cotangent of the self-keyed conv: dW[k] = Σ gather_k(f)^T g.

    ``g`` must already be masked by the conv's output validity.
    Returns [K, Cin, Cout] float32."""
    kbits, starts, nchunks = sk
    deltas = tuple(int(d) for d in np.asarray(deltas).reshape(-1))
    b, n, c = feats.shape
    k = len(deltas)
    t = _pick_tile(n)
    w_raw = w_width or sk_window(t, n)
    cout = g.shape[-1]
    itemsize = jnp.dtype(feats.dtype).itemsize
    c_g, n_cg, plan_pack = _sk_plan(n, c, itemsize)
    pack = plan_pack if pack is None else pack
    if pack > 1:
        c_g = min(_padded_lanes(c), 128) // pack
        n_cg = -(-c // c_g)
    w = sk_window_packed(t, pack, n // pack) if pack > 1 else w_raw
    feats, _, kpk = _sk_prep(feats, jnp.zeros((k, c, cout), feats.dtype),
                             key, pack, c_g, n_cg)
    g = g.astype(feats.dtype)

    c_pad = n_cg * c_g
    dw = jnp.zeros((k, c_pad, cout), jnp.float32)
    for cg in range(n_cg):
        f_sl = feats[:, :, cg * c_g:(cg + 1) * c_g]
        if pack > 1:
            f_sl = f_sl.reshape(b, n // pack, pack * c_g)
        dcg = _dw_call_sk(starts, nchunks, key, kpk, kbits, f_sl, g,
                          deltas=deltas, t=t, w=w, cout=cout, pack=pack,
                          w_raw=w_raw)
        if pack > 1:
            # lane groups hold the same channel slice for different
            # sub-rows: dW[k, l] = sum_s dcg[k, s*c_g + l]
            dcg = dcg.reshape(k, pack, c_g, cout).sum(axis=1)
        else:
            dcg = dcg.reshape(k, c_g, cout)
        dw = dw.at[:, cg * c_g:(cg + 1) * c_g, :].set(dcg)
    return dw[:, :c, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def pallas_conv_sk_op(deltas, feats, weights, key, kbits, starts, nchunks,
                      valid):
    """Differentiable self-keyed submanifold conv (no bias — add outside).

    Valid for SYMMETRIC offset sets enumerated so that ``deltas[K-1-k] ==
    -deltas[k]`` (K3_OFFSETS' z-fastest order satisfies this): the data
    cotangent is then the same self-keyed conv with W'[k] = W[K-1-k]^T
    over the identical key/bitmap pack — a hit (i, k) exists iff the hit
    (i + d_k, K-1-k) does, because both endpoints are real in-range
    voxels.  Matches the training direction of ME's submanifold convs
    (reference minkunet.py:55-121 under train.py:39-151)."""
    idk = deltas.index(0) if 0 in deltas else None
    return gather_gemm_conv_sk(feats, weights, key,
                               (kbits, starts, nchunks), valid, deltas,
                               identity_k=idk)


def _pallas_conv_sk_fwd(deltas, feats, weights, key, kbits, starts,
                        nchunks, valid):
    out = pallas_conv_sk_op(deltas, feats, weights, key, kbits, starts,
                            nchunks, valid)
    return out, (feats, weights, key, kbits, starts, nchunks, valid)


def _pallas_conv_sk_bwd(deltas, res, g):
    feats, weights, key, kbits, starts, nchunks, valid = res
    g_m = jnp.where(valid[..., None], g, 0).astype(feats.dtype)
    idk = deltas.index(0) if 0 in deltas else None
    wb = jnp.flip(weights, axis=0).swapaxes(1, 2)
    dfeats = gather_gemm_conv_sk(g_m, wb, key, (kbits, starts, nchunks),
                                 valid, deltas, identity_k=idk)
    dw = dw_gather_gemm_sk(feats, g_m, key, (kbits, starts, nchunks),
                           deltas).astype(weights.dtype)

    def f0(x):
        return np.zeros(x.shape, jax.dtypes.float0)

    return (dfeats.astype(feats.dtype), dw, f0(key), f0(kbits),
            f0(starts), f0(nchunks), f0(valid))


pallas_conv_sk_op.defvjp(_pallas_conv_sk_fwd, _pallas_conv_sk_bwd)


# ------------------------------------------------------------- int8 path
#
# Inference-only quantized route (ROADMAP r2 #5): per-channel symmetric
# int8 activations with the channel scale FOLDED INTO THE WEIGHTS before
# per-output-column weight quantization, so the whole gather+GEMM runs
# int8 x int8 -> int32 on the MXU (2x rate) with ONE f32 column scale at
# the end — and int8 tables halve VMEM, doubling the channel-group width.
# The one-hot gather is exact in int8 (it copies table rows verbatim).


@functools.partial(
    jax.jit, static_argnames=("t", "w", "kg", "n_out", "cout",
                              "pack", "w_raw", "out_dtype", "identity_k",
                              "bcast_k", "n_cg"))
def _gather_gemm_call_q8(idx_t, starts, nchunks, feats_q, w_q, vco,
                         t, w, kg, n_out, cout, pack=1, w_raw=None,
                         out_dtype=jnp.float32, identity_k=None,
                         bcast_k=False, n_cg=1):
    """int8 variant of :func:`_gather_gemm_call` (n_kg == 1 by plan).

    feats_q: [B, N, n_cg * Cblk] int8, channel-group-major (lane-packed
    within each group like the bf16 kernel when pack > 1); w_q:
    [n_cg, kg*Cblk, Cout] int8; vco: [n_cg, Cout] f32 per-output-column
    dequant scale (per channel group — weight quantization is per group).
    Channel groups are a grid dimension: each group's int32 GEMM result is
    dequantized with ITS scale and accumulated in f32 VMEM; the output
    block is written once.
    Returns [B, n_out, Cout] ``out_dtype``.
    """
    b, n, c_all = feats_q.shape
    assert c_all % n_cg == 0
    c = c_all // n_cg
    nt = n_out // t
    kp = idx_t.shape[2]
    assert n % 32 == 0 and w % 32 == 0, (n, w)
    if pack > 1:
        assert w_raw is not None and c % pack == 0
    shift = pack.bit_length() - 1
    c_sub = c // pack

    def kernel(starts_ref, nchunks_ref, idx_ref, feats_ref, w_ref, vco_ref,
               out_ref, gall_ref, acc_ref):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        cgi = pl.program_id(2)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (t, w), 1)
        if pack > 1:
            lane_grp = jax.lax.broadcasted_iota(
                jnp.int32, (t, c), 1) // c_sub

        def gather_union(idxv, k_scal):
            flat = (k_scal * pl.num_programs(0) + bi) * nt + ti
            st_raw = starts_ref[flat]
            nch_raw = nchunks_ref[flat]
            if pack > 1:
                stp0 = st_raw >> shift
                st = jnp.maximum(stp0 - stp0 % 32, 0)
                st = jnp.minimum(st, n - w)
                bound = (stp0 - st) + (nch_raw * w_raw) // pack + 1
                nch = bound // w + 1
                local0 = (idxv >> shift) - st
                rbits = jax.lax.bitwise_and(idxv, pack - 1)
            else:
                st = st_raw
                nch = nch_raw
                local0 = idxv - st
            base = (local0[:, None] == iota_w)
            window0 = feats_ref[0, pl.ds(pl.multiple_of(st, 32), w), :]
            g = jnp.dot(base.astype(jnp.int8), window0,
                        preferred_element_type=jnp.int32)

            def chunk_body(ci, acc):
                wst = pl.multiple_of(jnp.minimum(st + ci * w, n - w), 32)
                lo = local0[:, None] - (wst - st)
                oh = ((lo == iota_w)
                      & (local0[:, None] >= ci * w)
                      & (local0[:, None] < (ci + 1) * w))
                win = feats_ref[0, pl.ds(wst, w), :]
                return acc + jnp.dot(oh.astype(jnp.int8), win,
                                     preferred_element_type=jnp.int32)

            g = jax.lax.fori_loop(1, nch, chunk_body, g)
            if pack > 1:
                g = jnp.where(lane_grp == rbits[:, None], g, 0)
            return g

        if bcast_k:
            # wide bcast GEMM (see the bf16 kernel): one [T, C] int8
            # gather, one [C, kg*Cout] GEMM, octant-select on the int32
            # result with each wide column's own dequant scale
            idx_u = idx_ref[0, 0, 0, :]
            for j in range(1, kg):
                idx_u = jnp.maximum(idx_u, idx_ref[0, 0, j, :])
            g_u = gather_union(idx_u, 0).astype(jnp.int8)
            gemm = jnp.dot(g_u, w_ref[0], preferred_element_type=jnp.int32)
            wide = gemm.astype(jnp.float32) * vco_ref[0, 0, :][None, :]
            contrib = jnp.zeros((t, cout), jnp.float32)
            for j in range(kg):
                hit_j = idx_ref[0, 0, j, :][:, None] >= 0
                contrib = contrib + jnp.where(
                    hit_j, wide[:, j * cout:(j + 1) * cout], 0.0)
        else:
            for j in range(kg):
                if identity_k is not None and pack == 1 and j == identity_k:
                    idxv = idx_ref[0, 0, j, :]
                    rows = feats_ref[0, pl.ds(ti * t, t), :]
                    gall_ref[:, j * c:(j + 1) * c] = jnp.where(
                        idxv[:, None] >= 0, rows, 0).astype(jnp.int8)
                    continue
                g = gather_union(idx_ref[0, 0, j, :], j)
                # one-hot rows copy table entries verbatim: stays int8
                gall_ref[:, j * c:(j + 1) * c] = g.astype(jnp.int8)

        if not bcast_k:
            gemm = jnp.dot(gall_ref[:, :], w_ref[0],
                           preferred_element_type=jnp.int32)
            contrib = (gemm.astype(jnp.float32)
                       * vco_ref[0, 0, :][None, :])

        if n_cg == 1:
            out_ref[0, :, :] = contrib.astype(out_ref.dtype)
        else:
            @pl.when(cgi == 0)
            def _():
                acc_ref[:, :] = contrib

            @pl.when(cgi != 0)
            def _():
                acc_ref[:, :] = acc_ref[:, :] + contrib

            @pl.when(cgi == n_cg - 1)
            def _():
                out_ref[0, :, :] = acc_ref[:, :].astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nt, n_cg),
        in_specs=[
            pl.BlockSpec((1, 1, kp, t), lambda bi, ti, cgi, s1, s2:
                         (bi, ti, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda bi, ti, cgi, s1, s2:
                         (bi, 0, cgi), memory_space=pltpu.VMEM),
            (pl.BlockSpec((1, c, kg * cout), lambda bi, ti, cgi, s1, s2:
                          (cgi, 0, 0), memory_space=pltpu.VMEM)
             if bcast_k else
             pl.BlockSpec((1, kg * c, cout), lambda bi, ti, cgi, s1, s2:
                          (cgi, 0, 0), memory_space=pltpu.VMEM)),
            # [n_cg, 1, cols] with a singleton middle axis: Mosaic
            # requires the block's LAST TWO dims to divide (8, 128) or
            # equal the array dims — (1, cols) == (1, cols)
            pl.BlockSpec((1, 1, kg * cout if bcast_k else cout),
                         lambda bi, ti, cgi, s1, s2:
                         (cgi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, cout), lambda bi, ti, cgi, s1, s2:
                               (bi, ti, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 128) if bcast_k else (t, kg * c),
                                   jnp.int8),
                        pltpu.VMEM((t, cout), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_out, cout), out_dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(starts, nchunks, idx_t, feats_q, w_q, vco)


def gather_gemm_conv_tiled_q8(feats, weights, tiled, out_valid, bias=None,
                              k=None, w_width=None, identity_k=None,
                              bcast_k=False, act_absmax=None):
    """Quantized conv on a precomputed tiled map (inference only).

    feats: [B, N, C] float (bf16/f32); weights [K, Cin, Cout] f32.
    Per-channel activation scales fold into the weights; per-output-column
    weight quantization; the kernel runs fully int8.

    act_absmax: optional [C] f32 CALIBRATED per-channel activation absmax
    (see SparseConvK3's ``q8_stats`` collection) — skips the dynamic
    full-tensor abs-max reduction (one extra HBM pass per conv otherwise)
    at the cost of clipping rare out-of-calibration activations."""
    idx_t, starts_f, nchunks_f = tiled
    b, n, c = feats.shape
    t = idx_t.shape[3]
    w_width = w_width or default_window(t, n)
    k = k or weights.shape[0]
    kp = idx_t.shape[2]
    n_out = idx_t.shape[1] * t
    cout = weights.shape[-1]
    assert n % 32 == 0, n

    if (_stream_enabled() and not bcast_k
            and n * 128 > _TABLE_BUDGET):
        return gather_gemm_conv_streamed(feats, weights, tiled, out_valid,
                                         bias=bias, k=k, w_width=w_width,
                                         q8=True, act_absmax=act_absmax)
    f32 = feats.astype(jnp.float32)
    if act_absmax is None:
        act_absmax = jnp.abs(f32).max(axis=(0, 1))
    s_c = jnp.maximum(act_absmax.astype(jnp.float32), 1e-8) / 127.0  # [C]
    q_f = jnp.clip(jnp.round(f32 / s_c), -127, 127).astype(jnp.int8)

    # int8 halves the table bytes -> the split plan doubles c_g
    c_g, n_cg, c_pad, kg, n_kg, pack = _split_plan(n, c, k, kp, itemsize=1)
    assert n_kg == 1, (n_kg, kg, c_g)
    if c_pad > c:
        q_f = jnp.pad(q_f, ((0, 0), (0, 0), (0, c_pad - c)))
    w_fold = weights.astype(jnp.float32) * s_c[None, :, None]  # [K, C, Cout]
    w_fold = jnp.pad(w_fold, ((0, n_kg * kg - k), (0, c_pad - c), (0, 0)))

    w_call = packed_window(t, pack, n // pack) if pack > 1 else w_width
    # per-group pallas_call loop for n_cg > 1 (same VMEM double-buffering
    # reasoning as gather_gemm_conv_tiled); weight quantization is PER
    # GROUP either way (each group's dequant column scale rides along)
    out = None
    for cg in range(n_cg):
        f_sl = q_f[:, :, cg * c_g:(cg + 1) * c_g]
        w_sl = w_fold[:, cg * c_g:(cg + 1) * c_g, :]
        if bcast_k:
            # octant-minor wide restack; per-WIDE-column quantization so
            # each octant's Cout block keeps its own scale
            w_sl = w_sl.transpose(1, 0, 2).reshape(c_g, kg * cout)
            m_co = jnp.maximum(jnp.abs(w_sl).max(axis=0), 1e-12) / 127.0
            w_q = jnp.clip(jnp.round(w_sl / m_co), -127, 127).astype(
                jnp.int8)
            if pack > 1:
                f_sl = f_sl.reshape(b, n // pack, pack * c_g)
                w_q = jnp.tile(w_q, (pack, 1))
            w_q = w_q[None]
        else:
            m_co = jnp.maximum(jnp.abs(w_sl).max(axis=(0, 1)),
                               1e-12) / 127.0
            w_q = jnp.clip(jnp.round(w_sl / m_co), -127, 127).astype(
                jnp.int8)
            if pack > 1:
                f_sl = f_sl.reshape(b, n // pack, pack * c_g)
                w_q = jnp.tile(w_q, (1, pack, 1))
            w_q = w_q.reshape(1, kg * pack * c_g, cout)
        contrib = _gather_gemm_call_q8(
            idx_t, starts_f, nchunks_f, f_sl, w_q, m_co[None, None, :],
            t=t, w=w_call, kg=kg, n_out=n_out, cout=cout,
            pack=pack, w_raw=w_width, out_dtype=feats.dtype,
            identity_k=(identity_k if pack == 1
                        and feats.shape[1] == n_out else None),
            bcast_k=bcast_k)
        out = contrib if out is None else out + contrib
    out = out.astype(feats.dtype)
    if bias is not None:
        out = out + bias.astype(feats.dtype)
    return jnp.where(out_valid[..., None], out, 0)


# ------------------------------------------------------- HBM-streamed path
#
# Windowed conv with the feature table RESIDENT IN HBM (r5): per
# (offset, tile) the kernel DMAs just the [W, C] window into a VMEM slot
# ring (pltpu.make_async_copy, double-buffered across the offset loop)
# instead of keeping the whole [N, C] table VMEM-resident.  This removes
# the _TABLE_BUDGET constraint entirely: production-scale levels (72k+
# rows) run UN-PACKED at full 128-lane channel groups — no pack-fold
# extra compares, no channel-group table duplication.  HBM traffic is
# K * nt * W * C bytes per conv (~0.4 ms at 819 GB/s for the 72k/128-lane
# case), hidden behind the window dots.
#
# Inference path (table maps; misses encoded _MISS as usual).  Gated by
# MRCC_CONV_STREAM (default: on for over-budget tables on hardware).


_STREAM_SLOTS = 2


@functools.partial(
    jax.jit,
    static_argnames=("t", "w", "kg", "n_out", "cout", "out_dtype", "q8"))
def _gather_gemm_call_hbm(idx_t, starts, nchunks, feats, w_grp, vco,
                          t, w, kg, n_out, cout, out_dtype, q8=False):
    """Streamed windowed gather-GEMM: feats stays in HBM (pl.ANY).

    idx_t/starts/nchunks: tiled maps (build_tiled_maps), RAW rows, ONE
    offset group (kg == K).  feats: [B, N, C] (C <= 128 lanes); w_grp:
    [1, kg*C, Cout]; vco: [1, 1, Cout] f32 dequant scale (q8) or ones.
    Returns [B, n_out, Cout].
    """
    b, n, c = feats.shape
    nt = n_out // t
    kp = idx_t.shape[2]
    s_slots = _STREAM_SLOTS

    def kernel(starts_ref, nchunks_ref, idx_ref, feats_ref, w_ref, vco_ref,
               out_ref, gall_ref, win_ref, csem_ref):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (t, w), 1)

        def dma(j_or_st, slot, is_start):
            # starts are 32-aligned at build (build_tiled_maps) — the
            # explicit hint is required for Mosaic to prove the DMA row
            # offset divisible by the dtype's sublane tiling
            st = pl.multiple_of(j_or_st, 32)
            return pltpu.make_async_copy(
                feats_ref.at[bi, pl.ds(st, w), :],
                win_ref.at[slot], csem_ref.at[slot])

        def st_of(j):
            flat = (j * pl.num_programs(0) + bi) * nt + ti
            return starts_ref[flat], nchunks_ref[flat]

        st0, _ = st_of(0)
        dma(st0, 0, True).start()

        for j in range(kg):
            st, nch = st_of(j)
            if j + 1 < kg:
                st_n, _ = st_of(j + 1)
                dma(st_n, (j + 1) % s_slots, True).start()
            dma(st, j % s_slots, False).wait()
            idxv = idx_ref[0, 0, j, :]
            local0 = idxv - st
            base = local0[:, None] == iota_w
            window0 = win_ref[j % s_slots]
            acc_t = jnp.int32 if q8 else jnp.float32
            g = jnp.dot(base.astype(window0.dtype), window0,
                        preferred_element_type=acc_t)

            def chunk_body(ci, acc, local0=local0, st=st):
                # rare wide spans: synchronous chunk DMA into the spare
                # slot, disjoint index-range partition keeps adds exact
                wst = jnp.minimum(st + ci * w, n - w)
                wst = pl.multiple_of(wst - wst % 32, 32)
                d = pltpu.make_async_copy(
                    feats_ref.at[bi, pl.ds(wst, w), :],
                    win_ref.at[s_slots], csem_ref.at[s_slots])
                d.start()
                d.wait()
                lo = local0[:, None] - (wst - st)
                oh = ((lo == iota_w)
                      & (local0[:, None] >= ci * w)
                      & (local0[:, None] < (ci + 1) * w))
                win = win_ref[s_slots]
                return acc + jnp.dot(oh.astype(win.dtype), win,
                                     preferred_element_type=acc_t)

            g = jax.lax.fori_loop(1, nch, chunk_body, g)
            gall_ref[:, j * c:(j + 1) * c] = g.astype(gall_ref.dtype)

        gemm = jnp.dot(gall_ref[:, :], w_ref[0],
                       preferred_element_type=(jnp.int32 if q8
                                               else jnp.float32))
        if q8:
            out_ref[0, :, :] = (gemm.astype(jnp.float32)
                                * vco_ref[0, 0, :][None, :]).astype(
                                    out_ref.dtype)
        else:
            out_ref[0, :, :] = gemm.astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, 1, kp, t), lambda bi, ti, s1, s2:
                         (bi, ti, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),        # feats in HBM
            pl.BlockSpec((1, kg * c, cout), lambda bi, ti, s1, s2:
                         (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cout), lambda bi, ti, s1, s2: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, cout), lambda bi, ti, s1, s2:
                               (bi, ti, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((t, kg * c), feats.dtype),
            pltpu.VMEM((s_slots + 1, w, c), feats.dtype),
            pltpu.SemaphoreType.DMA((s_slots + 1,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_out, cout), out_dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(starts, nchunks, idx_t, feats, w_grp, vco)


def _stream_enabled() -> bool:
    """HBM-streamed route for over-budget tables.  Default ON since the
    on-chip A/B (r5): production B=2/131k int8 9.82 vs 8.46 clouds/s
    with the lane-packed resident path.  MRCC_CONV_STREAM=0 restores
    the resident/packed routing."""
    return os.environ.get("MRCC_CONV_STREAM", "1") != "0"


def gather_gemm_conv_streamed(feats, weights, tiled, out_valid, bias=None,
                              k=None, w_width=None, q8=False,
                              act_absmax=None):
    """Streamed conv wrapper: 128-lane channel groups over an HBM table.

    Same arguments/semantics as gather_gemm_conv_tiled; intended for
    levels whose table exceeds the VMEM budget (production scale).  For
    ``q8`` the activation quantization matches gather_gemm_conv_tiled_q8
    (folded per-channel scales, per-output-column weight quant per
    group)."""
    idx_t, starts_f, nchunks_f = tiled
    b, n, c = feats.shape
    t = idx_t.shape[3]
    w_width = w_width or default_window(t, n)
    k = k or weights.shape[0]
    kp = idx_t.shape[2]
    n_out = idx_t.shape[1] * t
    cout = weights.shape[-1]

    if q8:
        f32 = feats.astype(jnp.float32)
        if act_absmax is None:
            act_absmax = jnp.abs(f32).max(axis=(0, 1))
        s_c = jnp.maximum(act_absmax.astype(jnp.float32), 1e-8) / 127.0
        table = jnp.clip(jnp.round(f32 / s_c), -127, 127).astype(jnp.int8)
        w_eff = weights.astype(jnp.float32) * s_c[None, :, None]
    else:
        table = feats
        w_eff = weights.astype(feats.dtype)

    c_g = min(_padded_lanes(c), 128)
    n_cg = -(-c // c_g)
    c_pad = n_cg * c_g
    if c_pad > c:
        table = jnp.pad(table, ((0, 0), (0, 0), (0, c_pad - c)))
        w_eff = jnp.pad(w_eff, ((0, 0), (0, c_pad - c), (0, 0)))

    out = None
    for cg in range(n_cg):
        f_sl = table[:, :, cg * c_g:(cg + 1) * c_g]
        w_sl = w_eff[:, cg * c_g:(cg + 1) * c_g, :]
        if q8:
            m_co = jnp.maximum(jnp.abs(w_sl).max(axis=(0, 1)),
                               1e-12) / 127.0
            w_sl = jnp.clip(jnp.round(w_sl / m_co), -127, 127).astype(
                jnp.int8)
            vco = m_co[None, None, :]
        else:
            vco = jnp.ones((1, 1, cout), jnp.float32)
        contrib = _gather_gemm_call_hbm(
            idx_t, starts_f, nchunks_f, f_sl, w_sl.reshape(1, k * c_g, cout),
            vco, t=t, w=w_width, kg=k, n_out=n_out, cout=cout,
            out_dtype=feats.dtype, q8=q8)
        out = contrib if out is None else out + contrib
    out = out.astype(feats.dtype)
    if bias is not None:
        out = out + bias.astype(feats.dtype)
    return jnp.where(out_valid[..., None], out, 0)


# --------------------------------------------------------------- custom VJP
#
# Training on the kernel path (reference hot loop: train.py:39-151 /
# minkunet.py:125-183 runs forward AND backward through MinkowskiEngine's
# C++ conv).  The submanifold adjacency is symmetric, so both cotangents
# are expressible with the SAME windowed kernels:
#
#   dfeats = conv(g, W')           over the REVERSE kernel map
#            (k=3: same level map with W'[k] = W[K-1-k]^T;
#             k=2 s=2 down <-> up: each other's map with W'[k] = W[k]^T)
#   dW[k]  = sum_tiles gather_k(feats)^T @ g_tile   (dw kernel below)
#
# Only coordinate-derived maps have this symmetry — arbitrary synthetic
# maps do not (tests use real hierarchies).


@functools.partial(
    jax.jit, static_argnames=("t", "w", "kg", "n_kg", "cout",
                              "pack", "w_raw"))
def _dw_call(idx_t, starts, nchunks, feats, g, t, w, kg, n_kg, cout,
             pack=1, w_raw=None):
    """dW accumulation kernel: dw[k] = sum_{b,tiles} gather_k(feats)^T @ g.

    idx_t: [B, nt, KP, T] (misses = _MISS); starts/nchunks: [KP*B*nt].
    feats: [B, N, C]; g: [B, n_out, Cout] (pre-masked by out_valid).
    Returns [n_kg, kg*C, Cout] float32 (offset-major slices).

    Grid order (kgi, bi, ti): the dw output block (index kgi) stays
    VMEM-resident across all (b, tile) steps and is written back n_kg
    times total; the feature table re-DMAs only when bi changes.
    """
    b, n, c = feats.shape
    n_out = g.shape[1]
    nt = n_out // t
    kp = idx_t.shape[2]
    if pack > 1:
        assert n % 32 == 0 and w % 32 == 0 and w_raw is not None
        assert c % pack == 0
    shift = pack.bit_length() - 1
    c_sub = c // pack
    align = 32 if pack > 1 else 8

    def kernel(starts_ref, nchunks_ref, idx_ref, feats_ref, g_ref,
               dw_ref):
        kgi = pl.program_id(0)
        bi = pl.program_id(1)
        ti = pl.program_id(2)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (t, w), 1)
        if pack > 1:
            lane_grp = jax.lax.broadcasted_iota(
                jnp.int32, (t, c), 1) // c_sub

        @pl.when(jnp.logical_and(bi == 0, ti == 0))
        def _():
            dw_ref[0, :, :] = jnp.zeros_like(dw_ref[0, :, :])

        gt = g_ref[0, :, :]                                   # [T, Cout]
        for j in range(kg):
            k = kgi * kg + j
            flat = (k * pl.num_programs(1) + bi) * nt + ti
            st_raw = starts_ref[flat]
            nch_raw = nchunks_ref[flat]
            idxv = idx_ref[0, 0, k, :]
            if pack > 1:
                stp0 = st_raw >> shift
                st = jnp.maximum(stp0 - stp0 % 32, 0)
                st = jnp.minimum(st, n - w)
                bound = (stp0 - st) + (nch_raw * w_raw) // pack + 1
                nch = bound // w + 1
                local0 = (idxv >> shift) - st
                rbits = jax.lax.bitwise_and(idxv, pack - 1)
            else:
                st = st_raw
                nch = nch_raw
                local0 = idxv - st
            base = local0[:, None] == iota_w
            window0 = feats_ref[0, pl.ds(pl.multiple_of(st, align), w), :]
            gath = jnp.dot(base.astype(window0.dtype), window0,
                           preferred_element_type=jnp.float32)

            def chunk_body(ci, acc):
                wst = pl.multiple_of(jnp.minimum(st + ci * w, n - w), align)
                lo = local0[:, None] - (wst - st)
                oh = ((lo == iota_w)
                      & (local0[:, None] >= ci * w)
                      & (local0[:, None] < (ci + 1) * w))
                win = feats_ref[0, pl.ds(wst, w), :]
                return acc + jnp.dot(oh.astype(win.dtype), win,
                                     preferred_element_type=jnp.float32)

            gath = jax.lax.fori_loop(1, nch, chunk_body, gath)
            if pack > 1:
                gath = jnp.where(lane_grp == rbits[:, None], gath, 0.0)
            # [C, Cout] contribution: contract the tile dimension
            contrib = jax.lax.dot_general(
                gath.astype(gt.dtype), gt,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dw_ref[0, j * c:(j + 1) * c, :] = (
                dw_ref[0, j * c:(j + 1) * c, :] + contrib)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_kg, b, nt),
        in_specs=[
            pl.BlockSpec((1, 1, kp, t), lambda kgi, bi, ti, s1, s2:
                         (bi, ti, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda kgi, bi, ti, s1, s2: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, cout), lambda kgi, bi, ti, s1, s2:
                         (bi, ti, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kg * c, cout),
                               lambda kgi, bi, ti, s1, s2: (kgi, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_kg, kg * c, cout), jnp.float32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(starts, nchunks, idx_t, feats, g)


def dw_gather_gemm(feats, g, tiled, k, cin, w_width=None):
    """Weight cotangent over a tiled map: dW[k] = Σ gather_k(feats)^T g.

    ``g`` must already be masked by the conv's output validity.
    Returns [K, Cin, Cout] float32."""
    idx_t, starts_f, nchunks_f = tiled
    b, n, c = feats.shape
    assert c == cin
    t = idx_t.shape[3]
    w_width = w_width or default_window(t, n)
    kp = idx_t.shape[2]
    cout = g.shape[-1]
    itemsize = jnp.dtype(feats.dtype).itemsize
    c_g, n_cg, c_pad, kg, n_kg, pack = _split_plan(n, c, k, kp, itemsize)
    if c_pad > c:
        feats = jnp.pad(feats, ((0, 0), (0, 0), (0, c_pad - c)))
    g = g.astype(feats.dtype)

    w_call = packed_window(t, pack, n // pack) if pack > 1 else w_width
    dw = jnp.zeros((n_kg * kg, c_pad, cout), jnp.float32)
    for cg in range(n_cg):
        f_sl = feats[:, :, cg * c_g:(cg + 1) * c_g]
        if pack > 1:
            f_sl = f_sl.reshape(b, n // pack, pack * c_g)
        dcg = _dw_call(idx_t, starts_f, nchunks_f, f_sl, g,
                       t=t, w=w_call, kg=kg, n_kg=n_kg, cout=cout,
                       pack=pack, w_raw=w_width)
        if pack > 1:
            # lane groups hold the same channel slice for different
            # sub-rows: dW[k, l] = sum_r dcg[k, r*c_g + l]
            dcg = dcg.reshape(n_kg * kg, pack, c_g, cout).sum(axis=1)
        else:
            dcg = dcg.reshape(n_kg * kg, c_g, cout)
        dw = dw.at[:, cg * c_g:(cg + 1) * c_g, :].set(dcg)
    return dw[:k, :c, :]


# identity-offset index per forward mode: K3_OFFSETS[13] == (0, 0, 0)
# (z-fastest enumeration, sparse/hierarchy.py).  k=2 s=2 maps have no
# identity offset; "up" maps are broadcast instead.
_IDENTITY_K = {"k3": 13}
_BWD_BCAST = {"down": True}  # down's backward runs the up (octant) maps


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def pallas_conv_op(mode, feats, weights, fi, fs, fn,
                   bi_, bs, bn, in_valid, out_valid):
    """Differentiable windowed gather-GEMM conv (no bias — add it outside).

    mode: 'k3' (27-offset same-level; bwd = same maps, W reversed+transposed)
          | 'down' (8-child strided; bwd = up maps, W transposed)
          | 'up'   (8-octant transpose; bwd = child maps, W transposed).
    (fi, fs, fn): forward tiled maps (input table -> output rows);
    (bi_, bs, bn): backward tiled maps (output table -> input rows).
    """
    return gather_gemm_conv_tiled(feats, weights, (fi, fs, fn),
                                  out_valid, k=weights.shape[0],
                                  identity_k=_IDENTITY_K.get(mode),
                                  bcast_k=mode == "up")


def _pallas_conv_fwd(mode, feats, weights, fi, fs, fn,
                     bi_, bs, bn, in_valid, out_valid):
    out = pallas_conv_op(mode, feats, weights, fi, fs, fn,
                         bi_, bs, bn, in_valid, out_valid)
    return out, (feats, weights, fi, fs, fn, bi_, bs, bn,
                 in_valid, out_valid)


def _pallas_conv_bwd(mode, res, g):
    (feats, weights, fi, fs, fn, bi_, bs, bn,
     in_valid, out_valid) = res
    k = weights.shape[0]
    g_m = jnp.where(out_valid[..., None], g, 0).astype(feats.dtype)
    if mode == "k3":
        wb = jnp.flip(weights, axis=0).swapaxes(1, 2)
    else:
        wb = weights.swapaxes(1, 2)
    dfeats = gather_gemm_conv_tiled(g_m, wb, (bi_, bs, bn), in_valid,
                                    k=k, identity_k=_IDENTITY_K.get(mode),
                                    bcast_k=_BWD_BCAST.get(mode, False))
    dw = dw_gather_gemm(feats, g_m, (fi, fs, fn), k,
                        cin=feats.shape[-1]).astype(weights.dtype)

    def f0(x):
        return np.zeros(x.shape, jax.dtypes.float0)

    return (dfeats.astype(feats.dtype), dw, f0(fi), f0(fs), f0(fn),
            f0(bi_), f0(bs), f0(bn), f0(in_valid), f0(out_valid))


pallas_conv_op.defvjp(_pallas_conv_fwd, _pallas_conv_bwd)


def _table_fits(n, itemsize) -> bool:
    """Table budget check including the lane-pack escape hatch: packing
    p in (2, 4) shrinks the 128-lane table p-fold (requires 32p-divisible
    capacities and a table at least one packed window deep).  With the
    HBM-streamed route enabled, any 32-row-divisible table qualifies
    (windows are DMA'd per (offset, tile))."""
    if n * 128 * itemsize <= _TABLE_BUDGET:
        return True
    for p in (2, 4):
        if (n % (32 * p) == 0 and n // p >= 128
                and (n // p) * 128 * itemsize <= _TABLE_BUDGET):
            return True
    return _stream_enabled() and n % 32 == 0


def supported_dims(n_table, n_out, itemsize=2) -> bool:
    """Size-based variant of :func:`supported` (for gating the backward
    direction, whose table is the cotangent [B, n_out_fwd, Cout])."""
    if not _table_fits(n_table, itemsize):
        return False
    return _pick_tile(n_out) >= 8 and n_table >= 8 and n_table % 8 == 0


def supported(nbr_idx, feats) -> bool:
    """Whether the Pallas kernel handles these shapes (else use XLA path).

    Tables over the VMEM budget at the 128-lane channel-split floor
    (N * 128 padded lanes * itemsize; Mosaic pads the lane dimension to
    128) are LANE-PACKED 2-4x (production-scale levels, e.g. 72k voxels);
    only tables too big even packed fall back to the XLA gather path."""
    n_out = nbr_idx.shape[-1]
    n = feats.shape[-2]
    itemsize = jnp.dtype(feats.dtype).itemsize
    if not _table_fits(n, itemsize):
        return False
    # n % 8: window starts are clamped to n - w and asserted
    # pl.multiple_of(st, 8); a non-multiple-of-8 capacity would violate the
    # Mosaic alignment hint and could silently corrupt results (ADVICE r2)
    return _pick_tile(n_out) >= 8 and n >= 8 and n % 8 == 0
