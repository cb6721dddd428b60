"""Flax modules over the sparse voxel core.

These mirror the MinkowskiEngine layer zoo the reference models use
(minkunet.py:55-123, resnet.py:51-84, robotnet_segmentation.py:41-53):
convolutions (k3s1 / k2s2 / transpose / 1x1), masked BatchNorm/InstanceNorm,
global pools and per-voxel linear layers — all on ``[B, N, C]`` buffers with
validity masks.

Feature tensors flow through modules as plain arrays; the coordinate
``Level`` structures from :mod:`mrcc_tpu.sparse.hierarchy` are passed
alongside (they carry no parameters).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import conv as C


def _kaiming_kernel_init(key, shape, dtype):
    """He-normal init over (K, Cin, Cout) kernels, fan_out mode with ReLU gain,
    matching ME.utils.kaiming_normal_(kernel, mode='fan_out') semantics
    (reference resnet.py:86-93): fan_out = Cout."""
    fan_out = shape[-1]
    std = jnp.sqrt(2.0 / fan_out)
    return jax.random.normal(key, shape, dtype) * std


def _q8_calibration(mod: nn.Module, feats):
    """Static int8 activation scales (``q8_stats`` collection).

    The quantized conv path needs a per-channel activation absmax; computed
    dynamically it costs a full [B, N, C] HBM pass per conv.  A calibration
    apply (``mutable=["q8_stats"]``) records the running absmax here; later
    applies that carry the collection get the CALIBRATED scale for free and
    skip the dynamic reduction (InferenceEngine.calibrate_q8).

    Never touched during ``init`` (everything is mutable there — recording
    a zero scale would poison every later apply), and absent collections
    leave the dynamic path untouched.
    """
    if mod.is_initializing():
        return None
    c = feats.shape[-1]
    if mod.is_mutable_collection("q8_stats"):
        v = mod.variable("q8_stats", "act_absmax",
                         lambda: jnp.zeros((c,), jnp.float32))
        cur = jnp.abs(feats.astype(jnp.float32)).max(axis=tuple(
            range(feats.ndim - 1)))
        v.value = jnp.maximum(v.value, cur)
        return None  # calibration pass itself stays exact (dynamic)
    if mod.has_variable("q8_stats", "act_absmax"):
        return mod.get_variable("q8_stats", "act_absmax")
    return None


class SparseConvK3(nn.Module):
    """k=3 s=1 sparse conv on one level."""

    out_channels: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, feats, level):
        w = self.param("kernel", _kaiming_kernel_init,
                       (27, feats.shape[-1], self.out_channels), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (self.out_channels,),
                        jnp.float32) if self.use_bias else None)
        return C.conv_k3(feats, w, level, bias=b,
                         act_absmax=_q8_calibration(self, feats))


class SparseConv1x1(nn.Module):
    """k=1 sparse conv (pointwise GEMM)."""

    out_channels: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, feats, valid):
        w = self.param("kernel", _kaiming_kernel_init,
                       (1, feats.shape[-1], self.out_channels), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (self.out_channels,),
                        jnp.float32) if self.use_bias else None)
        return C.conv1x1(feats, w, valid, bias=b)


class SparseConvDown(nn.Module):
    """k=2 s=2 strided sparse conv: fine level -> coarse level."""

    out_channels: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, feats, fine_level, coarse_level):
        w = self.param("kernel", _kaiming_kernel_init,
                       (8, feats.shape[-1], self.out_channels), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (self.out_channels,),
                        jnp.float32) if self.use_bias else None)
        return C.conv_down(feats, w, fine_level, coarse_level, bias=b,
                           act_absmax=_q8_calibration(self, feats))


class SparseConvTranspose(nn.Module):
    """k=2 s=2 transpose conv: coarse level -> cached fine level."""

    out_channels: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, feats, coarse_level, fine_level):
        w = self.param("kernel", _kaiming_kernel_init,
                       (8, feats.shape[-1], self.out_channels), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (self.out_channels,),
                        jnp.float32) if self.use_bias else None)
        return C.conv_transpose_up(feats, w, coarse_level, fine_level,
                                   bias=b,
                                   act_absmax=_q8_calibration(self, feats))


class SparseBatchNorm(nn.Module):
    """Masked BatchNorm over all valid voxels across the batch.

    Torch-BN semantics (ME.MinkowskiBatchNorm wraps nn.BatchNorm1d): biased
    variance for normalization, momentum 0.1 running stats, eps 1e-5,
    affine weight=1 bias=0 init (reference resnet.py:91-93).
    """

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, feats, valid, train: bool = False):
        c = feats.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        f32 = feats.astype(jnp.float32)
        if train:
            v = valid[..., None].astype(jnp.float32)
            n = jnp.maximum(v.sum(), 1.0)
            mean = (f32 * v).sum(axis=(0, 1)) / n
            var = (((f32 - mean) ** 2) * v).sum(axis=(0, 1)) / n
            if not self.is_initializing():
                m = self.momentum
                # torch stores unbiased variance in running stats
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        out = (f32 - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return jnp.where(valid[..., None], out.astype(feats.dtype), 0)


class SparseInstanceNorm(nn.Module):
    """Per-item masked instance norm (ME.MinkowskiInstanceNorm, resnet.py:55)."""

    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, feats, valid):
        c = feats.shape[-1]
        v = valid[..., None].astype(feats.dtype)
        n = jnp.maximum(v.sum(axis=1, keepdims=True), 1.0)
        mean = (feats * v).sum(axis=1, keepdims=True) / n
        var = (((feats - mean) ** 2) * v).sum(axis=1, keepdims=True) / n
        out = (feats - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (c,), feats.dtype)
            bias = self.param("bias", nn.initializers.zeros, (c,), feats.dtype)
            out = out * scale + bias
        return jnp.where(valid[..., None], out, 0.0)


class SparseLinear(nn.Module):
    """Per-voxel dense layer (ME.MinkowskiLinear, robotnet_segmentation.py:44)."""

    out_channels: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, feats, valid):
        out = nn.Dense(self.out_channels, use_bias=self.use_bias,
                       name="dense")(feats)
        return jnp.where(valid[..., None], out, 0.0)


class SparseDropout(nn.Module):
    """Voxel-feature dropout (ME.MinkowskiDropout, resnet.py:74)."""

    rate: float = 0.5

    @nn.compact
    def __call__(self, feats, train: bool = False):
        return nn.Dropout(self.rate, deterministic=not train)(feats)


def relu(feats):
    return jax.nn.relu(feats)


def leaky_relu(feats):
    return jax.nn.leaky_relu(feats, negative_slope=0.01)


def gelu(feats):
    return jax.nn.gelu(feats)


def sigmoid(feats):
    return jax.nn.sigmoid(feats)
