"""Functional sparse convolution / pooling ops over kernel maps.

The compute shape is deliberately MXU-friendly: every op is a small static
scan over kernel offsets where each step is one gather ``[B, N, Cin]`` plus
one GEMM ``[B*N, Cin] x [Cin, Cout]`` — large, batched, fusable matmuls with
no data-dependent shapes.  This replaces MinkowskiEngine's C++/CUDA
gather-GEMM-scatter convolution (reference minkunet.py:55-121) with the same
arithmetic on fixed-capacity buffers.

Weight layout: ``[K, Cin, Cout]`` with K = 27 (k=3 s=1), 8 (k=2 s=2) or 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .impl import current as _current_impl
from .impl import sparse_impl as conv_impl  # noqa: F401  (public alias)


def _pallas_route(feats, nbr_idx):
    impl = _current_impl()
    if impl not in ("pallas", "pallas-int8"):
        return False
    from ..ops import conv_pallas

    if impl == "pallas-int8" and feats.shape[-2] % 32 != 0:
        return False  # int8 sublane granularity
    return conv_pallas.supported(nbr_idx, feats)


def _pallas_route_tiled(feats, tiled):
    """Pallas-route check from a tiled map pack alone (the untiled
    [K, B, N] arrays are optional on the inference path — see
    ``build_hierarchy(keep_untiled=False)``)."""
    impl = _current_impl()
    if impl not in ("pallas", "pallas-int8"):
        return False
    from ..ops import conv_pallas

    if impl == "pallas-int8" and feats.shape[-2] % 32 != 0:
        return False  # int8 sublane granularity
    idx_t = tiled[0]                                  # [B, nt, KP, T]
    n_out = idx_t.shape[1] * idx_t.shape[3]
    itemsize = jnp.dtype(feats.dtype).itemsize
    return conv_pallas.supported_dims(feats.shape[-2], n_out,
                                      itemsize=itemsize)


def _q8():
    return _current_impl() == "pallas-int8"


def _gather_rows(feats, idx):
    """feats [B, N, C], idx [B, M] -> [B, M, C]."""
    return jnp.take_along_axis(feats, idx[..., None], axis=1)


def conv_kernel_map(feats, weights, nbr_idx, nbr_hit, out_valid, bias=None):
    """Generic sparse conv: out[i] = Σ_k hit[k,i] · feats[idx[k,i]] @ W[k].

    Args:
      feats: [B, N_in, Cin] input features (zeros at padding rows).
      weights: [K, Cin, Cout].
      nbr_idx: [K, B, N_out] indices into the input rows.
      nbr_hit: [K, B, N_out] whether the neighbour exists.
      out_valid: [B, N_out] output row validity.
      bias: optional [Cout].
    Returns [B, N_out, Cout].
    """
    if _pallas_route(feats, nbr_idx):
        from ..ops.conv_pallas import gather_gemm_conv

        return gather_gemm_conv(feats, weights, nbr_idx, nbr_hit, out_valid,
                                bias=bias)
    cout = weights.shape[-1]
    b, n_out = nbr_idx.shape[1], nbr_idx.shape[2]
    # compute in the feature dtype (bf16 halves gather bandwidth on TPU),
    # accumulate in f32 on the MXU, cast back at the end
    weights = weights.astype(feats.dtype)
    init = jnp.zeros((b, n_out, cout), dtype=jnp.float32)

    def step(acc, inputs):
        w, idx, hit = inputs
        g = _gather_rows(feats, idx)
        g = jnp.where(hit[..., None], g, 0)
        return acc + jnp.einsum(
            "bnc,cd->bnd", g, w, preferred_element_type=jnp.float32
        ), None

    out, _ = jax.lax.scan(step, init, (weights, nbr_idx, nbr_hit))
    out = out.astype(feats.dtype)
    if bias is not None:
        out = out + bias.astype(feats.dtype)
    return jnp.where(out_valid[..., None], out, 0)


def conv1x1(feats, weights, valid, bias=None):
    """Pointwise conv (ME kernel_size=1): a single GEMM."""
    w = (weights[0] if weights.ndim == 3 else weights).astype(feats.dtype)
    out = jnp.einsum("bnc,cd->bnd", feats, w,
                     preferred_element_type=jnp.float32).astype(feats.dtype)
    if bias is not None:
        out = out + bias.astype(feats.dtype)
    return jnp.where(valid[..., None], out, 0)


def _with_bias(out, bias, valid, dtype):
    """Bias stays outside the custom-VJP conv op (autodiff handles it)."""
    if bias is None:
        return out
    return jnp.where(valid[..., None], out + bias.astype(dtype), 0)


def conv_k3(feats, weights, level, bias=None, act_absmax=None):
    """k=3 s=1 conv on one level (27-neighbour kernel map).

    The Pallas route is differentiable: submanifold adjacency is symmetric,
    so the backward conv runs the SAME tiled map with W'[k] = W[26-k]^T
    (ops/conv_pallas.py custom VJP)."""
    if level.nbr_sk is not None and _current_impl() in ("pallas",
                                                        "pallas-int8"):
        # self-keyed: the one-hot is built from the level's sorted keys
        # in-kernel — no tables were materialised.  Differentiable via the
        # sk custom VJP (trainers self-key too); int8 engines run the
        # quantized sk kernel (packed tables cover production levels).
        from ..ops.conv_pallas import (gather_gemm_conv_sk_q8,
                                       pallas_conv_sk_op, sk_supported)
        from ..ops.rank_pallas import pack_deltas
        from .hierarchy import K3_OFFSETS

        n = feats.shape[-2]
        deltas = tuple(int(d) for d in pack_deltas(K3_OFFSETS))
        kbits, starts, nchunks = level.nbr_sk
        if _q8():
            assert sk_supported(n, itemsize=1), (
                f"self-keyed k3 pack built but int8 gate rejects n={n}")
            return gather_gemm_conv_sk_q8(
                feats, weights, level.key, level.nbr_sk, level.valid,
                deltas=deltas, bias=bias, identity_k=13,
                act_absmax=act_absmax)
        itemsize = jnp.dtype(feats.dtype).itemsize
        assert sk_supported(n, itemsize=itemsize), (
            "self-keyed k3 pack was built for this level but the conv's "
            f"dtype/shape (n={n}, itemsize={itemsize}) exceeds the "
            "self-keyed gate — build the hierarchy with tables instead")
        out = pallas_conv_sk_op(deltas, feats, weights, level.key, kbits,
                                starts, nchunks, level.valid)
        return _with_bias(out, bias, level.valid, feats.dtype)
    if (level.nbr_tiled is not None
            and _pallas_route_tiled(feats, level.nbr_tiled)):
        if _q8():
            from ..ops.conv_pallas import gather_gemm_conv_tiled_q8

            return gather_gemm_conv_tiled_q8(feats, weights,
                                             level.nbr_tiled, level.valid,
                                             bias=bias, k=weights.shape[0],
                                             identity_k=13,
                                             act_absmax=act_absmax)
        from ..ops.conv_pallas import pallas_conv_op

        out = pallas_conv_op("k3", feats, weights, *level.nbr_tiled,
                             *level.nbr_tiled, level.valid, level.valid)
        return _with_bias(out, bias, level.valid, feats.dtype)
    assert level.nbr_idx is not None, (
        "untiled k3 maps were skipped at build time (keep_untiled=False) "
        "but the Pallas route rejected this shape")
    return conv_kernel_map(feats, weights, level.nbr_idx, level.nbr_hit,
                           level.valid, bias=bias)


def conv_down(feats, weights, fine_level, coarse_level, bias=None,
              act_absmax=None):
    """k=2 s=2 conv: fine level -> coarse level (8-child kernel map).

    ``fine_level.child_idx`` lives on the coarse level per build_hierarchy.
    The Pallas route is differentiable when the fine level carries the
    cached ``up_tiled`` map (dfeats = transpose conv with W^T).
    """
    if (coarse_level.child_tiled is not None and _q8()
            and _pallas_route_tiled(feats, coarse_level.child_tiled)):
        from ..ops.conv_pallas import gather_gemm_conv_tiled_q8

        return gather_gemm_conv_tiled_q8(feats, weights,
                                         coarse_level.child_tiled,
                                         coarse_level.valid, bias=bias,
                                         k=weights.shape[0],
                                         act_absmax=act_absmax)
    if (coarse_level.child_tiled is not None
            and weights.shape[0] == 8
            and fine_level.up_tiled is not None
            and _pallas_route_tiled(feats, coarse_level.child_tiled)):
        from ..ops.conv_pallas import pallas_conv_op

        out = pallas_conv_op("down", feats, weights,
                             *coarse_level.child_tiled,
                             *fine_level.up_tiled,
                             fine_level.valid, coarse_level.valid)
        return _with_bias(out, bias, coarse_level.valid, feats.dtype)
    if (coarse_level.child_tiled is not None
            and _pallas_route_tiled(feats, coarse_level.child_tiled)):
        from ..ops.conv_pallas import gather_gemm_conv_tiled

        return gather_gemm_conv_tiled(feats, weights,
                                      coarse_level.child_tiled,
                                      coarse_level.valid, bias=bias,
                                      k=weights.shape[0])
    assert coarse_level.child_idx is not None, (
        "untiled child maps were skipped at build time (keep_untiled=False)"
        " but the Pallas route rejected this shape")
    return conv_kernel_map(feats, weights, coarse_level.child_idx,
                           coarse_level.child_hit, coarse_level.valid, bias=bias)


def conv_transpose_up(feats, weights, coarse_level, fine_level,
                      bias=None, act_absmax=None):
    """k=2 s=2 transpose conv: coarse level -> cached fine level.

    Each fine voxel has exactly one parent; its contribution uses the weight
    slice of the octant the fine voxel occupies:
    ``out[c] = feats[parent(c)] @ W[octant(c)]``.
    """
    if (fine_level.up_tiled is not None and _q8()
            and _pallas_route_tiled(feats, fine_level.up_tiled)):
        from ..ops.conv_pallas import gather_gemm_conv_tiled_q8

        return gather_gemm_conv_tiled_q8(feats, weights,
                                         fine_level.up_tiled,
                                         fine_level.valid, bias=bias,
                                         k=weights.shape[0], bcast_k=True,
                                         act_absmax=act_absmax)
    if (fine_level.up_tiled is not None and weights.shape[0] == 8
            and coarse_level.child_tiled is not None
            and _pallas_route_tiled(feats, fine_level.up_tiled)):
        from ..ops.conv_pallas import pallas_conv_op

        out = pallas_conv_op("up", feats, weights,
                             *fine_level.up_tiled,
                             *coarse_level.child_tiled,
                             coarse_level.valid, fine_level.valid)
        return _with_bias(out, bias, fine_level.valid, feats.dtype)
    parent_ok = (fine_level.parent_ok if fine_level.parent_ok is not None
                 else fine_level.valid)
    if _pallas_route(feats, fine_level.parent_idx[None]):
        from ..ops.conv_pallas import gather_gemm_conv

        # as a kernel map: idx_k = parent_idx for every octant k, hit_k
        # selects the voxels occupying octant k (parent_idx is monotone
        # since fine keys are sorted)
        k = weights.shape[0]
        idx8 = jnp.broadcast_to(fine_level.parent_idx[None],
                                (k,) + fine_level.parent_idx.shape)
        hit8 = (fine_level.octant[None] == jnp.arange(k)[:, None, None]
                ) & fine_level.valid[None] & parent_ok[None]
        return gather_gemm_conv(feats, weights, idx8, hit8,
                                fine_level.valid, bias=bias)
    parent_feats = _gather_rows(feats, fine_level.parent_idx)  # [B, Nf, Cin]
    parent_feats = jnp.where(parent_ok[..., None], parent_feats, 0)
    weights = weights.astype(feats.dtype)
    cout = weights.shape[-1]
    b, nf = fine_level.parent_idx.shape
    out = jnp.zeros((b, nf, cout), dtype=jnp.float32)

    def step(acc, inputs):
        w, k = inputs
        sel = (fine_level.octant == k)[..., None]
        contrib = jnp.einsum(
            "bnc,cd->bnd", parent_feats, w, preferred_element_type=jnp.float32
        )
        return acc + jnp.where(sel, contrib, 0), None

    out, _ = jax.lax.scan(step, out, (weights, jnp.arange(8)))
    out = out.astype(feats.dtype)
    if bias is not None:
        out = out + bias.astype(feats.dtype)
    return jnp.where(fine_level.valid[..., None], out, 0)


def max_pool_down(feats, fine_level, coarse_level):
    """k=2 s=2 max pool: fine -> coarse (masked max over children)."""
    neg = jnp.asarray(-jnp.inf, feats.dtype)
    b, nc = coarse_level.valid.shape
    acc = jnp.full((b, nc, feats.shape[-1]), neg, feats.dtype)

    def step(acc, inputs):
        idx, hit = inputs
        g = _gather_rows(feats, idx)
        g = jnp.where(hit[..., None], g, neg)
        return jnp.maximum(acc, g), None

    acc, _ = jax.lax.scan(step, acc, (coarse_level.child_idx, coarse_level.child_hit))
    acc = jnp.where(jnp.isfinite(acc), acc, 0.0)
    return jnp.where(coarse_level.valid[..., None], acc, 0.0)


def global_max_pool(feats, valid):
    """Per-item masked global max over voxels: [B, N, C] -> [B, C].

    Replaces ME.MinkowskiGlobalMaxPooling (robotnet.py:43).
    """
    neg = jnp.asarray(-jnp.inf, feats.dtype)
    m = jnp.where(valid[..., None], feats, neg).max(axis=1)
    return jnp.where(jnp.isfinite(m), m, 0.0)


def global_avg_pool(feats, valid):
    """Per-item masked global mean: [B, N, C] -> [B, C].

    Replaces ME.MinkowskiGlobalAvgPooling (robotnet_encode.py:41).
    """
    v = valid[..., None].astype(feats.dtype)
    s = (feats * v).sum(axis=1)
    n = jnp.maximum(v.sum(axis=1), 1.0)
    return s / n


def cat(feats_a, feats_b, valid):
    """Channel concat of two feature sets on the same coords (ME.cat)."""
    out = jnp.concatenate([feats_a, feats_b], axis=-1)
    return jnp.where(valid[..., None], out, 0.0)
