"""Sparse residual blocks (BasicBlock / Bottleneck).

Parity with MinkowskiEngine's ``modules/resnet_block.py`` as used by the
reference backbones (minkunet.py:30, resnet.py:29): conv k=3 s=1 -> BN ->
ReLU -> conv k=3 s=1 -> BN -> (+residual, 1x1+BN downsample when channel
counts change) -> ReLU.  Stride is always 1 inside MinkUNet (downsampling is
done by dedicated k=2 s=2 convs).
"""

from __future__ import annotations

import flax.linen as nn
import jax

from ..sparse.nn import SparseBatchNorm, SparseConv1x1, SparseConvK3


class SparseBasicBlock(nn.Module):
    """BasicBlock (expansion=1)."""

    planes: int
    expansion: int = 1

    @nn.compact
    def __call__(self, feats, level, train: bool = False):
        residual = feats
        out = SparseConvK3(self.planes, name="conv1")(feats, level)
        out = SparseBatchNorm(name="norm1")(out, level.valid, train=train)
        out = jax.nn.relu(out)
        out = SparseConvK3(self.planes, name="conv2")(out, level)
        out = SparseBatchNorm(name="norm2")(out, level.valid, train=train)
        if feats.shape[-1] != self.planes:
            residual = SparseConv1x1(self.planes, name="downsample_conv")(
                feats, level.valid)
            residual = SparseBatchNorm(name="downsample_norm")(
                residual, level.valid, train=train)
        return jax.nn.relu(out + residual)


class SparseBottleneck(nn.Module):
    """Bottleneck (expansion=4)."""

    planes: int
    expansion: int = 4

    @nn.compact
    def __call__(self, feats, level, train: bool = False):
        out_ch = self.planes * self.expansion
        residual = feats
        out = SparseConv1x1(self.planes, name="conv1")(feats, level.valid)
        out = SparseBatchNorm(name="norm1")(out, level.valid, train=train)
        out = jax.nn.relu(out)
        out = SparseConvK3(self.planes, name="conv2")(out, level)
        out = SparseBatchNorm(name="norm2")(out, level.valid, train=train)
        out = jax.nn.relu(out)
        out = SparseConv1x1(out_ch, name="conv3")(out, level.valid)
        out = SparseBatchNorm(name="norm3")(out, level.valid, train=train)
        if feats.shape[-1] != out_ch:
            residual = SparseConv1x1(out_ch, name="downsample_conv")(
                feats, level.valid)
            residual = SparseBatchNorm(name="downsample_norm")(
                residual, level.valid, train=train)
        return jax.nn.relu(out + residual)


BLOCKS = {"basic": SparseBasicBlock, "bottleneck": SparseBottleneck}
EXPANSION = {"basic": 1, "bottleneck": 4}
