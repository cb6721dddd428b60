"""FeatureNet: metric-learning embedding model over sparse voxels.

Parity: /root/reference/model/featurenet.py:14-27 — full MinkUNet34A forward
(including the final 1x1 conv to the embedding width) -> BatchNorm ->
LeakyReLU -> global AVG pool.  Trained with TripletMarginLoss +
MultiSimilarityMiner on YCB object clouds (train_feature-extractor.py);
the miner/loss live in mrcc_tpu.train.metric_learning.
"""

from __future__ import annotations

import flax.linen as nn
import jax

from ..sparse import conv as C
from ..sparse.nn import SparseBatchNorm
from .minkunet import MinkUNetBase, make_minkunet


class FeatureNet(nn.Module):
    in_channels: int = 3
    out_channels: int = 16  # embedding dim
    backbone: str = "minkunet34A"

    @nn.compact
    def __call__(self, feats, levels, train: bool = False):
        unet = make_minkunet(self.backbone, self.in_channels,
                             self.out_channels)
        net = MinkUNetBase(in_channels=self.in_channels,
                           out_channels=self.out_channels,
                           planes=unet.planes, layers=unet.layers,
                           block=unet.block, name="unet")
        out = net(feats, levels, train=train)  # incl. final 1x1 conv
        out = SparseBatchNorm(name="final_bn")(out, levels[0].valid,
                                               train=train)
        out = jax.nn.leaky_relu(out, negative_slope=0.01)
        return C.global_avg_pool(out, levels[0].valid)
