"""MinkUNet family on the TPU sparse core.

Architecture parity with reference model/backbone/minkunet.py (Choy et al.
CVPR'19): a 4-down/4-up sparse U-Net —

  conv0 (k3 s1) -> [k2 s2 down + blocks] x4 -> [k2 s2 transpose + skip-cat +
  blocks] x4 -> final 1x1 conv

Variants differ in LAYERS (block repeats), PLANES (widths) and BLOCK type.
The default backbone everywhere in the reference is **MinkUNet18D**
(robotnet.py:21-22: PLANES (32,64,128,256,384,384,384,384), LAYERS 2x8,
BasicBlock).

Models are flax modules over ``(feats, levels)`` where ``levels`` is the
5-level coordinate hierarchy from :func:`mrcc_tpu.sparse.build_hierarchy`
(depth=4).  Feature buffers are ``[B, N_l, C]`` per level.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax

from ..sparse import conv as C
from ..sparse.nn import (
    SparseBatchNorm,
    SparseConv1x1,
    SparseConvDown,
    SparseConvK3,
    SparseConvTranspose,
)
from .blocks import BLOCKS, EXPANSION

DEPTH = 4  # stride-2 downsamplings; build_hierarchy(voxels, depth=DEPTH)


class MinkUNetBase(nn.Module):
    """Configurable sparse U-Net backbone.

    Attributes:
      in_channels / out_channels: feature widths.
      planes: 8 widths (4 encoder, 4 decoder).
      layers: 8 block repeat counts.
      block: "basic" | "bottleneck".
      init_dim: stem width (32 in all reference variants).
    """

    in_channels: int
    out_channels: int
    planes: Tuple[int, ...] = (32, 64, 128, 256, 256, 128, 96, 96)
    layers: Tuple[int, ...] = (2, 2, 2, 2, 2, 2, 2, 2)
    block: str = "basic"
    init_dim: int = 32
    # rematerialize residual blocks in the backward pass (jax.checkpoint):
    # trades recompute for activation memory so the wide flagship (18D,
    # 384-ch decoder) trains on one 16G chip.  Param tree is unchanged
    # (lifted transform preserves scopes) — checkpoints stay compatible.
    remat: bool = False

    @property
    def expansion(self) -> int:
        return EXPANSION[self.block]

    def _blocks(self, name, feats, level, planes, reps, train):
        block_cls = BLOCKS[self.block]
        if self.remat:
            # static_argnums counts self: (self, feats, level, train) -> 3
            block_cls = nn.remat(block_cls, static_argnums=(3,))
        for i in range(reps):
            feats = block_cls(planes, name=f"{name}_{i}")(feats, level, train)
        return feats

    @nn.compact
    def forward_except_final(self, feats, levels, train: bool = False,
                             stop_stage: int = None):
        """U-Net forward up to (not including) the final 1x1 conv.

        Returns per-voxel features [B, N0, planes[7]*expansion] at level 0.
        Parity: minkunet.py:125 ``forward_except_final``.

        ``stop_stage`` (profiling only): return the intermediate after stage
        s in {0: stem, 1-4: encoder blocks, 5-8: decoder blocks}; params for
        later stages are then never created (init with the same value).
        """
        l0, l1, l2, l3, l4 = levels[:5]

        out = SparseConvK3(self.init_dim, name="conv0p1s1")(feats, l0)
        out = SparseBatchNorm(name="bn0")(out, l0.valid, train=train)
        out_p1 = jax.nn.relu(out)
        if stop_stage == 0:
            return out_p1

        out = SparseConvDown(self.init_dim, name="conv1p1s2")(out_p1, l0, l1)
        out = SparseBatchNorm(name="bn1")(out, l1.valid, train=train)
        out = jax.nn.relu(out)
        out_b1p2 = self._blocks("block1", out, l1, self.planes[0],
                                self.layers[0], train)
        if stop_stage == 1:
            return out_b1p2

        out = SparseConvDown(out_b1p2.shape[-1], name="conv2p2s2")(out_b1p2, l1, l2)
        out = SparseBatchNorm(name="bn2")(out, l2.valid, train=train)
        out = jax.nn.relu(out)
        out_b2p4 = self._blocks("block2", out, l2, self.planes[1],
                                self.layers[1], train)
        if stop_stage == 2:
            return out_b2p4

        out = SparseConvDown(out_b2p4.shape[-1], name="conv3p4s2")(out_b2p4, l2, l3)
        out = SparseBatchNorm(name="bn3")(out, l3.valid, train=train)
        out = jax.nn.relu(out)
        out_b3p8 = self._blocks("block3", out, l3, self.planes[2],
                                self.layers[2], train)
        if stop_stage == 3:
            return out_b3p8

        out = SparseConvDown(out_b3p8.shape[-1], name="conv4p8s2")(out_b3p8, l3, l4)
        out = SparseBatchNorm(name="bn4")(out, l4.valid, train=train)
        out = jax.nn.relu(out)
        out = self._blocks("block4", out, l4, self.planes[3],
                           self.layers[3], train)
        if stop_stage == 4:
            return out

        # decoder: stride 16 -> 8
        out = SparseConvTranspose(self.planes[4], name="convtr4p16s2")(out, l4, l3)
        out = SparseBatchNorm(name="bntr4")(out, l3.valid, train=train)
        out = jax.nn.relu(out)
        out = C.cat(out, out_b3p8, l3.valid)
        out = self._blocks("block5", out, l3, self.planes[4],
                           self.layers[4], train)
        if stop_stage == 5:
            return out

        out = SparseConvTranspose(self.planes[5], name="convtr5p8s2")(out, l3, l2)
        out = SparseBatchNorm(name="bntr5")(out, l2.valid, train=train)
        out = jax.nn.relu(out)
        out = C.cat(out, out_b2p4, l2.valid)
        out = self._blocks("block6", out, l2, self.planes[5],
                           self.layers[5], train)
        if stop_stage == 6:
            return out

        out = SparseConvTranspose(self.planes[6], name="convtr6p4s2")(out, l2, l1)
        out = SparseBatchNorm(name="bntr6")(out, l1.valid, train=train)
        out = jax.nn.relu(out)
        out = C.cat(out, out_b1p2, l1.valid)
        out = self._blocks("block7", out, l1, self.planes[6],
                           self.layers[6], train)
        if stop_stage == 7:
            return out

        out = SparseConvTranspose(self.planes[7], name="convtr7p2s2")(out, l1, l0)
        out = SparseBatchNorm(name="bntr7")(out, l0.valid, train=train)
        out = jax.nn.relu(out)
        out = C.cat(out, out_p1, l0.valid)
        out = self._blocks("block8", out, l0, self.planes[7],
                           self.layers[7], train)
        return out

    @nn.compact
    def encode(self, feats, levels, train: bool = False):
        """Encoder-only forward through block4 at stride 16 (level 4).

        Parity: robotnet_encode.py:68-95 (the convtr stages are skipped).
        """
        l0, l1, l2, l3, l4 = levels[:5]
        out = SparseConvK3(self.init_dim, name="conv0p1s1")(feats, l0)
        out = SparseBatchNorm(name="bn0")(out, l0.valid, train=train)
        out = jax.nn.relu(out)
        out = SparseConvDown(self.init_dim, name="conv1p1s2")(out, l0, l1)
        out = SparseBatchNorm(name="bn1")(out, l1.valid, train=train)
        out = jax.nn.relu(out)
        out = self._blocks("block1", out, l1, self.planes[0], self.layers[0], train)
        out = SparseConvDown(out.shape[-1], name="conv2p2s2")(out, l1, l2)
        out = SparseBatchNorm(name="bn2")(out, l2.valid, train=train)
        out = jax.nn.relu(out)
        out = self._blocks("block2", out, l2, self.planes[1], self.layers[1], train)
        out = SparseConvDown(out.shape[-1], name="conv3p4s2")(out, l2, l3)
        out = SparseBatchNorm(name="bn3")(out, l3.valid, train=train)
        out = jax.nn.relu(out)
        out = self._blocks("block3", out, l3, self.planes[2], self.layers[2], train)
        out = SparseConvDown(out.shape[-1], name="conv4p8s2")(out, l3, l4)
        out = SparseBatchNorm(name="bn4")(out, l4.valid, train=train)
        out = jax.nn.relu(out)
        out = self._blocks("block4", out, l4, self.planes[3], self.layers[3], train)
        return out

    @nn.compact
    def __call__(self, feats, levels, train: bool = False):
        out = self.forward_except_final(feats, levels, train=train)
        return SparseConv1x1(self.out_channels, use_bias=True, name="final")(
            out, levels[0].valid
        )


# ---------------------------------------------------------------- variants
# (minkunet.py:189-251)

_VARIANTS = {
    "minkunet14":  dict(layers=(1,) * 8, block="basic"),
    "minkunet18":  dict(layers=(2,) * 8, block="basic"),
    "minkunet34":  dict(layers=(2, 3, 4, 6, 2, 2, 2, 2), block="basic"),
    "minkunet50":  dict(layers=(2, 3, 4, 6, 2, 2, 2, 2), block="bottleneck"),
    "minkunet101": dict(layers=(2, 3, 4, 23, 2, 2, 2, 2), block="bottleneck"),
}
_PLANES = {
    "A": (32, 64, 128, 256, 128, 128, 96, 96),
    "B": (32, 64, 128, 256, 128, 128, 128, 128),
    "C": (32, 64, 128, 256, 192, 192, 128, 128),
    "D": (32, 64, 128, 256, 384, 384, 384, 384),
    "34A": (32, 64, 128, 256, 256, 128, 64, 64),
    "34B": (32, 64, 128, 256, 256, 128, 64, 32),
    "34C": (32, 64, 128, 256, 256, 128, 96, 96),
}


def make_minkunet(name: str, in_channels: int, out_channels: int,
                  remat: bool = False) -> MinkUNetBase:
    """Factory for named variants: 'minkunet18D', 'minkunet14A', 'minkunet34C',
    'minkunet101', or bare 'minkunet' (-> 18D, the reference default)."""
    name = name.lower()
    if name == "minkunet":
        name = "minkunet18d"
    base, letter = name[:-1], name[-1].upper()
    if letter not in "ABCD":
        base, letter = name, None
    cfg = dict(_VARIANTS[base])
    if letter is not None:
        key = base.replace("minkunet", "") + letter if base == "minkunet34" else letter
        cfg["planes"] = _PLANES[key]
    return MinkUNetBase(in_channels=in_channels, out_channels=out_channels,
                        remat=remat, **cfg)


def MinkUNet18D(in_channels, out_channels):
    return make_minkunet("minkunet18D", in_channels, out_channels)


def MinkUNet14A(in_channels, out_channels):
    return make_minkunet("minkunet14A", in_channels, out_channels)


def MinkUNet34C(in_channels, out_channels):
    return make_minkunet("minkunet34C", in_channels, out_channels)


def MinkUNet34A(in_channels, out_channels):
    return make_minkunet("minkunet34A", in_channels, out_channels)


def MinkUNet101(in_channels, out_channels):
    return make_minkunet("minkunet101", in_channels, out_channels)
