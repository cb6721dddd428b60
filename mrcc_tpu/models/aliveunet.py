"""AliveUNet: the config-driven deeper sparse U-Net.

Parity: /root/reference/model/backbone/aliveunet.py:45-275 — a 7-down/7-up
U-Net with PLANES = m·(1..7, 7..1), block repeats and block type
(BasicBlock/Bottleneck) taken from the config (STRUCTURE.m/block_reps/
bottleneck; the reference mutates the class at import from the singleton —
here they are constructor fields).

Generalised over depth: ``depth`` down/up stages operating on a
``depth+1``-level hierarchy from ``build_hierarchy(vox, depth)``.
"""

from __future__ import annotations

from typing import Optional, Tuple

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


class AliveUNet(nn.Module):
    in_channels: int
    out_channels: int
    m: int = 32                    # STRUCTURE.m
    depth: int = 7
    block_reps: int = 2            # STRUCTURE.block_reps
    block: str = "bottleneck"      # STRUCTURE.bottleneck -> Bottleneck
    init_dim: Optional[int] = None  # defaults to m

    @property
    def planes(self) -> Tuple[int, ...]:
        up = tuple(self.m * i for i in range(1, self.depth + 1))
        return up + up[::-1]

    def _blocks(self, name, feats, level, planes, train):
        block_cls = BLOCKS[self.block]
        for i in range(self.block_reps):
            feats = block_cls(planes, name=f"{name}_{i}")(feats, level,
                                                          train=train)
        return feats

    @nn.compact
    def __call__(self, feats, levels, train: bool = False):
        d = self.depth
        assert len(levels) >= d + 1, f"need {d + 1} hierarchy levels"
        init_dim = self.init_dim or self.m
        planes = self.planes

        out = SparseConvK3(init_dim, name="conv0")(feats, levels[0])
        out = SparseBatchNorm(name="bn0")(out, levels[0].valid, train=train)
        out = jax.nn.relu(out)
        stem = out

        skips = []
        for i in range(d):
            out = SparseConvDown(out.shape[-1], name=f"down{i}")(
                out, levels[i], levels[i + 1])
            out = SparseBatchNorm(name=f"bn_down{i}")(out, levels[i + 1].valid,
                                                      train=train)
            out = jax.nn.relu(out)
            out = self._blocks(f"enc{i}", out, levels[i + 1], planes[i], train)
            skips.append(out)

        for i in range(d):
            j = d - 1 - i  # decoder target level index
            out = SparseConvTranspose(planes[d + i], name=f"up{i}")(
                out, levels[j + 1], levels[j])
            out = SparseBatchNorm(name=f"bn_up{i}")(out, levels[j].valid,
                                                    train=train)
            out = jax.nn.relu(out)
            skip = skips[j - 1] if j > 0 else stem
            out = C.cat(out, skip, levels[j].valid)
            out = self._blocks(f"dec{i}", out, levels[j], planes[d + i], train)

        return SparseConv1x1(self.out_channels, use_bias=True, name="final")(
            out, levels[0].valid)
