"""Pallas windowed-rank kernel: sorted-key neighbour lookups without sorts.

The coordinate hierarchy (sparse/hierarchy.py) resolves every kernel-map
query with ``searchsorted(keys, keys + delta, method='sort')`` — one sort
over ``N + 27N`` keys per level (~28 ms/level on-chip, the single biggest
cost of the inference pipeline after the convolutions).

This kernel exploits the same monotonicity as the conv gather: per offset,
queries ``q = qbase + delta`` are sorted, so a tile of T queries ranks
inside a narrow window of the searched keys.  Per (item, tile, offset):

  rank_i  = st + #{ keys[pos] < q_i : pos in covered segments }
  hit_i   = any( keys[pos] == q_i )          (keys are unique voxels)
  idx_i   = rank_i                            (sorted unique keys)

computed with [T, W] compares + row sums on the VPU — no sorts, no
gathers.  Window starts/chunk counts come from a SMALL boundary
searchsorted (tile-boundary queries only: K*nt instead of K*N).
Exactness is unconditional via the same disjoint span-partition chunk loop
as ops/conv_pallas.py.

Replaces ``_neighbor_table_one`` (k=3 tables) and ``_child_table_one``
(strided k=2/k=3 tables, queries ``(parent_key << log2(stride)) + delta``)
on the inference path; oracle-tested against both in
tests/test_rank_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse.types import COORD_BITS, COORD_RANGE, KEY_PAD


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _pick_tile(n: int) -> int:
    # 256 first (shared convention with ops/conv_pallas.py): halves the
    # per-grid-step orchestration overhead on the big levels
    for t in (256, 128, 64, 32, 16, 8):
        if n % t == 0 and n >= t:
            return t
    return 0


def pack_deltas(offsets) -> np.ndarray:
    """Arithmetic key deltas for coordinate offsets [K, 3] (signed)."""
    offsets = np.asarray(offsets)
    return (offsets[:, 0] * (1 << (2 * COORD_BITS))
            + offsets[:, 1] * (1 << COORD_BITS)
            + offsets[:, 2]).astype(np.int32)


def _delta_runs(deltas) -> tuple:
    """Group offset deltas into runs of CONSECUTIVE integers (<=3 long).

    K3_OFFSETS is z-fastest, so its 27 deltas form nine (d-1, d, d+1)
    z-triples; strided k=2 tables form four (d, d+1) pairs.  Within a run
    only the FIRST member needs the windowed lt-count: keys are unique, so
      rank(q+1) = #{keys < q+1} = #{keys <= q} = rank(q) + hit(q)
    and every later member's rank follows from the base rank plus the
    accumulated hit bits.  Returns a tuple of runs, each a tuple of
    ORIGINAL k-indices whose deltas ascend consecutively.
    """
    deltas = [int(d) for d in deltas]
    order = sorted(range(len(deltas)), key=lambda i: deltas[i])
    runs, cur = [], [order[0]] if order else []
    for i in order[1:]:
        if len(cur) < 3 and deltas[i] == deltas[cur[-1]] + 1:
            cur.append(i)
        else:
            runs.append(tuple(cur))
            cur = [i]
    if cur:
        runs.append(tuple(cur))
    return tuple(runs)


@functools.partial(jax.jit,
                   static_argnames=("deltas", "runs", "t", "w", "kp"))
def _rank_call(keys, qbase, qvalid_t, starts, nchunks, deltas, runs, t, w,
               kp):
    """keys [B, N] sorted; qbase [B, Nq] sorted; qvalid_t [B, nt, KP, T];
    starts/nchunks [R*B*nt] i32 (per consecutive-delta run).
    Returns idx_t, hit_t [B, nt, KP, T]."""
    b, n = keys.shape
    nq = qbase.shape[1]
    nt = nq // t
    deltas_np = np.asarray(deltas, np.int32)
    k_real = len(deltas_np)
    # compiled Mosaic lane slices need 128-aligned offsets (the
    # multiple_of hints below assert it); interpret mode is lenient
    assert _interpret() or (t % 128 == 0 and w % 128 == 0
                            and n % 128 == 0), (t, w, n)

    def kernel(starts_ref, nchunks_ref, keys_ref, qbase_ref, qvalid_ref,
               idx_ref, hit_ref):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (t, w), 1)
        qtile = qbase_ref[0, 0, pl.ds(pl.multiple_of(ti * t, 128), t)]

        for r, run in enumerate(runs):
            length = len(run)
            q = qtile + int(deltas_np[run[0]])
            flat = (r * pl.num_programs(0) + bi) * nt + ti
            st = starts_ref[flat]
            nch = nchunks_ref[flat]

            def chunk(ci, carry, q=q, length=length):
                # single int32 carry (Mosaic cannot legalize tuple loop
                # carries): carry = rank << length | eq bits
                rank = carry >> length
                # lane-dim slices must be 128-aligned (st, w, n are)
                wst = pl.multiple_of(
                    jnp.minimum(st + ci * w, n - w), 128)
                window = keys_ref[0, 0, pl.ds(wst, w)]     # [W]
                pos = wst + iota_w[0]                       # [W]
                seg = ((pos >= st + ci * w)
                       & (pos < st + (ci + 1) * w))[None, :]
                # the lt-count needs the disjoint chunk partition (sums);
                # the eq compares are OR-accumulated over UNIQUE keys, so
                # revisiting positions (clamped windows overlap) is safe
                # and no seg mask is needed.
                cmp_lt = (window[None, :] < q[:, None]) & seg
                rank = rank + cmp_lt.astype(jnp.int32).sum(axis=1)
                eqs = carry
                for m in range(length):
                    cmp_eq = window[None, :] == (q + m)[:, None]
                    eqs = eqs | (cmp_eq.astype(jnp.int32).max(axis=1) << m)
                return (rank << length) | (eqs & ((1 << length) - 1))

            carry = jax.lax.fori_loop(0, nch, chunk,
                                      jnp.zeros((t,), jnp.int32))
            rank = carry >> length
            for m, k in enumerate(run):
                eq = (carry >> m) & 1
                valid = qvalid_ref[0, 0, k, :] != 0
                idx_ref[0, 0, k, :] = jnp.minimum(st + rank, n - 1)
                hit_ref[0, 0, k, :] = jnp.where(valid, eq, 0)
                # rank(q + m + 1) = rank(q + m) + hit(q + m)
                rank = rank + eq

        for k in range(k_real, kp):
            idx_ref[0, 0, k, :] = jnp.zeros((t,), jnp.int32)
            hit_ref[0, 0, k, :] = jnp.zeros((t,), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nt),
        in_specs=[
            # [B, 1, N] layout: the singleton middle dim satisfies
            # Mosaic's block rule (block dim == array dim) and makes the
            # per-item row index static — dynamic sublane indexing is not
            # supported for vector loads
            pl.BlockSpec((1, 1, n), lambda bi, ti, s1, s2: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nq), lambda bi, ti, s1, s2: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kp, t), lambda bi, ti, s1, s2:
                         (bi, ti, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, kp, t), lambda bi, ti, s1, s2:
                         (bi, ti, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kp, t), lambda bi, ti, s1, s2:
                         (bi, ti, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((b, nt, kp, t), jnp.int32),
                   jax.ShapeDtypeStruct((b, nt, kp, t), jnp.int32)],
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(starts, nchunks, keys[:, None, :], qbase[:, None, :], qvalid_t)


def rank_lookup(keys, qbase, deltas, qvalid, t=None, w=None,
                return_tiled=False):
    """Batched monotone lookups: for each offset delta, the rank and
    hit of ``qbase + delta`` in ``keys``.

    Args:
      keys: [B, N] int32 ascending per item (KEY_PAD padding).
      qbase: [B, Nq] int32 ascending per item.
      deltas: static [K] int (np array / tuple).
      qvalid: [K, B, Nq] bool — query validity (in-range & valid source).
      return_tiled: also return the conv-ready tiled pack
        (idx_t, hit_t, starts, nchunks) — the same window scalars serve
        ops/conv_pallas.py's gather windows, so convolutions on this
        level skip their per-call map preparation entirely.
    Returns (idx [K, B, Nq] int32, hit [K, B, Nq] bool[, tiled]).
    """
    from .conv_pallas import default_window

    deltas = tuple(int(d) for d in np.asarray(deltas).reshape(-1))
    k = len(deltas)
    b, n = keys.shape
    nq = qbase.shape[1]
    # the RANK kernel's own tile stays at 128 rows: its compare cost per
    # query row is its window width, and W grows with T (W = T + 128) —
    # T=256 cost 1.5x the VPU compares for the same answers.  The CONV
    # pack emitted below retiles to 256 rows (pure reshape of the same
    # data) where the bigger tile halves the conv's grid steps.
    t = t or min(_pick_tile(nq), 128)
    # this kernel slices the LANE axis (int32 keys), so its window width
    # must be a 128-multiple — round the shared convention up (the conv
    # pack below uses the conv's own finer-granularity window)
    w = w or min(-(-default_window(t, n) // 128) * 128, max(n - n % 128, 128))
    nt = nq // t
    kp = max(8, -(-k // 8) * 8)

    # small boundary lookup: ranks of each tile's first query.  Two
    # formulations with a size gate (measured, scripts/probe_k3_pieces.py):
    # a broadcast compare-count is 1.6x faster at pipeline scale (2.18 vs
    # 3.59 ms for all 5 levels) but is O(K*nt*N) — quadratic in N — so
    # production-scale tables (72k voxels) keep the O(N log N) sort path.
    qb = qbase[:, ::t]                                        # [B, nt]
    deltas_arr = jnp.asarray(deltas, jnp.int32)
    queries = (qb[None, :, :] + deltas_arr[:, None, None])    # [K, B, nt]
    flat_q = queries.transpose(1, 0, 2).reshape(b, k * nt)
    if k * nt * n <= (1 << 28):
        ranks = (keys[:, None, :] < flat_q[:, :, None]).sum(
            axis=-1, dtype=jnp.int32)
    else:
        ranks = jax.vmap(lambda ky, qq: jnp.searchsorted(
            ky, qq, side="left", method="sort"))(keys, flat_q)
    ranks = ranks.reshape(b, k, nt).transpose(1, 0, 2).astype(jnp.int32)

    ends = jnp.concatenate([ranks[:, :, 1:],
                            jnp.full((k, b, 1), n, jnp.int32)], axis=-1)

    # one window-scan per consecutive-delta RUN (z-triples/pairs): the
    # run's chunk span is [first member's start, last member's end] —
    # monotone deltas give monotone boundary ranks, and nchunks' +1 chunk
    # guarantees coverage past end_last, where every member's hit
    # position lives (rank(q+m) <= end_last).
    runs = _delta_runs(deltas)
    first = jnp.asarray([r[0] for r in runs], jnp.int32)
    last = jnp.asarray([r[-1] for r in runs], jnp.int32)
    ranks_run = jnp.take(ranks, first, axis=0)               # [R, B, nt]
    ends_run = jnp.take(ends, last, axis=0)
    # 128-aligned starts: Mosaic lane-dimension slices require it (the
    # rank kernel reads int32 keys along the LANE axis)
    starts_run = jnp.clip(ranks_run - (ranks_run % 128), 0, max(n - w, 0))
    span = jnp.maximum(ends_run - starts_run, 0)
    nchunks_run = jnp.minimum(span // w + 1, -(-n // w))

    def pad_k(a):
        return jnp.pad(a, ((0, kp - k),) + ((0, 0),) * (a.ndim - 1))

    qvalid_t = pad_k(qvalid.astype(jnp.int32)).reshape(
        kp, b, nt, t).transpose(1, 2, 0, 3)
    starts_f = starts_run.reshape(-1)
    nchunks_f = jnp.maximum(nchunks_run, 1).reshape(-1)

    idx_t, hit_t = _rank_call(keys, qbase, qvalid_t, starts_f, nchunks_f,
                              deltas, runs, t, w, kp)
    idx = idx_t.transpose(2, 0, 1, 3).reshape(kp, b, nq)[:k]
    hit = hit_t.transpose(2, 0, 1, 3).reshape(kp, b, nq)[:k] != 0
    if return_tiled:
        # conv windows slice the SUBLANE axis of the feature table, so
        # their starts need 32-alignment (int8 sublane granularity; bf16
        # needs only 8) — aligning down to 128 here wasted up to 127 of
        # each window and pushed ~half the tiles into a second gather
        # chunk (1.5x gather FLOPs on every conv).
        # NOTE the conv pack's window width is default_window(t, n) of the
        # CONV convention — recompute chunk counts against it, not this
        # kernel's own w.
        from .conv_pallas import _MISS
        from .conv_pallas import _pick_tile as conv_tile
        from .conv_pallas import default_window as conv_window

        tc = conv_tile(nq)
        wc = conv_window(tc, n)
        step = tc // t  # rank boundaries every t rows -> subsample
        ranks_c = ranks[:, :, ::step]                      # [K, B, ntc]
        ends_c = jnp.concatenate(
            [ranks_c[:, :, 1:], jnp.full((k, b, 1), n, jnp.int32)], axis=-1)
        starts_c = jnp.clip(ranks_c - (ranks_c % 32), 0, max(n - wc, 0))
        span_c = jnp.maximum(ends_c - starts_c, 0)
        nchunks_c = jnp.minimum(span_c // wc + 1, -(-n // wc))
        starts_cf = pad_k(starts_c).reshape(-1)
        nchunks_cf = jnp.maximum(pad_k(nchunks_c), 1).reshape(-1)
        idxh = jnp.where(hit_t != 0, idx_t, _MISS)         # [B, nt, KP, T]
        idxh_t = idxh.transpose(0, 2, 1, 3).reshape(
            b, kp, nq // tc, tc).transpose(0, 2, 1, 3)     # [B, ntc, KP, Tc]
        return idx, hit, (idxh_t, starts_cf, nchunks_cf)
    return idx, hit


def _border_qvalid(off, valid, offsets, scaled=1):
    """[K, B, N] query validity from six per-axis border masks.

    Equivalent to ``all(0 <= off*scaled + d < COORD_RANGE)`` & valid, but
    built from [B, N]-shaped masks: the direct [K, B, N, 3] broadcast has a
    minor dim of 3, which TPU layouts pad to 128 lanes — measured 3.9 ms of
    the 35 ms k3 table build at B=8/16k (scripts/probe_k3_pieces.py)."""
    offsets = np.asarray(offsets)
    ax = [off[..., i] * scaled for i in range(3)]             # [B, N] each
    d_lo = int(offsets.min())
    d_hi = int(offsets.max())
    # per-axis masks for every distinct negative/positive delta magnitude
    lo = {(i, d): ax[i] >= -d for i in range(3)
          for d in range(d_lo, 0)}
    hi = {(i, d): ax[i] < COORD_RANGE - d for i in range(3)
          for d in range(1, d_hi + 1)}
    cols = []
    for k_off in offsets:
        m = valid
        for i in range(3):
            d = int(k_off[i])
            if d < 0:
                m = m & lo[(i, d)]
            elif d > 0:
                m = m & hi[(i, d)]
        cols.append(m)
    return jnp.stack(cols, axis=0)                            # [K, B, N]


def sk_bits(off, valid, offsets):
    """Per-row query-validity BITMAP [B, N] int32 for the self-keyed conv
    (bit k = offset k's query is in coordinate range AND the row is valid).

    Replaces the [K, B, N] qvalid planes: the self-keyed kernel
    (ops/conv_pallas.py) reads one int32 per row and tests bits in-kernel.
    Built from the same six per-axis masks as :func:`_border_qvalid`.
    """
    cols = _border_qvalid(off, valid, offsets)                # [K, B, N]
    bits = cols[0].astype(jnp.int32)
    for k in range(1, cols.shape[0]):
        bits = bits | (cols[k].astype(jnp.int32) << k)
    return bits


def sk_neighbor_pack(off, key, valid, offsets, t=None, w=None):
    """Self-keyed k=3 s=1 conv pack for one level: (kbits, starts,
    nchunks) — no rank kernel, no neighbour tables (see
    ops/conv_pallas.py self-keyed section)."""
    from .conv_pallas import build_sk_maps

    deltas = pack_deltas(offsets)
    bits = sk_bits(off, valid, offsets)
    return build_sk_maps(key, bits, deltas, t=t, w_width=w)


def neighbor_tables(off, key, valid, offsets, t=None, w=None,
                    return_tiled=False):
    """k=3 s=1 neighbour tables, batched (replaces vmapped
    ``_neighbor_table_one``): (idx [K, B, N], hit [K, B, N][, tiled])."""
    offsets = np.asarray(offsets)
    deltas = pack_deltas(offsets)
    qvalid = _border_qvalid(off, valid, offsets)
    return rank_lookup(key, key, deltas, qvalid, t=t, w=w,
                       return_tiled=return_tiled)


def child_tables(parent_off, parent_key, parent_valid, child_key, offsets,
                 stride=2, t=None, w=None, return_tiled=False):
    """Strided kernel maps (replaces vmapped ``_child_table_one``):
    queries ``pack(parent*stride + d) = (parent_key << log2 stride) + d``.
    Returns (idx [K, Np...], hit[, tiled]) over the CHILD key set."""
    offsets = np.asarray(offsets)
    deltas = pack_deltas(offsets)
    shift = int(np.log2(stride))
    assert (1 << shift) == stride, "stride must be a power of two"
    qbase = jnp.where(parent_valid, parent_key << shift, KEY_PAD)
    qvalid = _border_qvalid(parent_off, parent_valid, offsets, scaled=stride)
    return rank_lookup(child_key, qbase, deltas, qvalid, t=t, w=w,
                       return_tiled=return_tiled)
