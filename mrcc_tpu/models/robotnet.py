"""RobotNet heads on the MinkUNet backbone.

Parity targets:
- RobotNet              (model/robotnet.py:37-83): full U-Net ->
  BN+ReLU output layer -> global MAX pool -> [optional joint angles] ->
  MLP(2048) -> out (7 pose or 10 pose+confidence); sigmoid on confidences;
  eval-only quaternion L2-normalisation of out[3:7].
- RobotNetEncode        (model/robotnet_encode.py:36-119): encoder-only to
  stride 16, global AVG pool, same MLP head; eval un-voxelises positions
  when trained with voxelize_position.
- RobotNetSegmentation  (model/robotnet_segmentation.py:35-64): full U-Net
  (out 256, bias) -> LeakyReLU -> per-voxel Linear 256->1024 -> LeakyReLU ->
  Linear 1024->num_classes.
- RobotNetVote          (model/robotnet_vote.py:39-79): same body as
  segmentation with num_classes = 2 (ee_seg) or 4.

Each model takes ``(feats, levels)`` from the sparse core plus optional
joint angles, and is config-free (explicit constructor args replace the
reference's import-time config singleton).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..sparse import conv as C
from ..sparse.nn import SparseBatchNorm, SparseLinear
from .minkunet import MinkUNetBase, make_minkunet


def _finalize_pose_output(out, train: bool, quantization_size: float = 0.0,
                          rot_dims: int = 4):
    """Shared eval-time head postprocessing (robotnet.py:79-83).

    rot_dims: 4 for WXYZ quaternion heads (reference layout), 6 for the
    opt-in continuous 6D parameterization (losses.LossType.COS2_6D) —
    confidence channels follow the rotation block either way."""
    pose_w = 3 + rot_dims
    if out.shape[-1] > pose_w:
        conf = jax.nn.sigmoid(out[..., pose_w:])
        out = jnp.concatenate([out[..., :pose_w], conf], axis=-1)
    if not train:
        r = out[..., 3:pose_w]
        if rot_dims == 4:
            r = r / jnp.maximum(jnp.linalg.norm(r, axis=-1, keepdims=True),
                                1e-12)
        pos = out[..., :3]
        if quantization_size:
            pos = pos * quantization_size
        out = jnp.concatenate([pos, r, out[..., pose_w:]], axis=-1)
    return out


class RobotNet(nn.Module):
    """7-DoF (or 10 with confidences) pose regression over the full U-Net."""

    backbone: str = "minkunet"
    in_channels: int = 3
    out_channels: int = 7
    use_joint_angles: bool = False
    rot_dims: int = 4  # 6 = continuous 6D head (opt-in)
    remat: bool = False  # checkpoint residual blocks (train memory)

    @nn.compact
    def __call__(self, feats, levels, joint_angles=None, train: bool = False):
        unet = make_minkunet(self.backbone, self.in_channels, self.out_channels)
        net = MinkUNetBase(in_channels=self.in_channels,
                           out_channels=self.out_channels,
                           planes=unet.planes, layers=unet.layers,
                           block=unet.block, remat=self.remat, name="unet")
        out = net.forward_except_final(feats, levels, train=train)
        out = SparseBatchNorm(name="output_bn")(out, levels[0].valid, train=train)
        out = jax.nn.relu(out)
        pooled = C.global_max_pool(out, levels[0].valid)

        if self.use_joint_angles:
            assert joint_angles is not None
            pooled = jnp.concatenate([pooled, joint_angles], axis=-1)

        h = nn.Dense(2048, name="pose_fc1")(pooled)
        h = jax.nn.leaky_relu(h, negative_slope=0.01)
        out = nn.Dense(self.out_channels, name="pose_fc2")(h)
        return _finalize_pose_output(out, train, rot_dims=self.rot_dims)


class RobotNetEncode(nn.Module):
    """Encoder-only pose regression (stride-16 features, global avg pool)."""

    backbone: str = "minkunet"
    in_channels: int = 3
    out_channels: int = 7
    use_joint_angles: bool = False
    voxelize_position: bool = False
    quantization_size: float = 0.01
    rot_dims: int = 4  # 6 = continuous 6D head (opt-in)
    remat: bool = False  # checkpoint residual blocks (train memory)

    @nn.compact
    def __call__(self, feats, levels, joint_angles=None, train: bool = False):
        unet = make_minkunet(self.backbone, self.in_channels, self.out_channels)
        net = MinkUNetBase(in_channels=self.in_channels,
                           out_channels=self.out_channels,
                           planes=unet.planes, layers=unet.layers,
                           block=unet.block, remat=self.remat, name="unet")
        out = net.encode(feats, levels, train=train)
        out = SparseBatchNorm(name="output_bn")(out, levels[4].valid, train=train)
        out = jax.nn.relu(out)
        pooled = C.global_avg_pool(out, levels[4].valid)

        if self.use_joint_angles:
            assert joint_angles is not None
            pooled = jnp.concatenate([pooled, joint_angles], axis=-1)

        h = nn.Dense(2048, name="pose_fc1")(pooled)
        h = jax.nn.leaky_relu(h, negative_slope=0.01)
        out = nn.Dense(self.out_channels, name="pose_fc2")(h)
        qsize = self.quantization_size if self.voxelize_position else 0.0
        return _finalize_pose_output(out, train, quantization_size=qsize,
                                     rot_dims=self.rot_dims)


class RobotNetSegmentation(nn.Module):
    """Per-voxel class logits (3-class arm/EE/background by default)."""

    backbone: str = "minkunet"
    in_channels: int = 3
    num_classes: int = 3
    unet_out_channels: int = 256
    remat: bool = False  # checkpoint residual blocks (train memory)

    @nn.compact
    def __call__(self, feats, levels, joint_angles=None, train: bool = False):
        unet = make_minkunet(self.backbone, self.in_channels,
                             self.unet_out_channels)
        net = MinkUNetBase(in_channels=self.in_channels,
                           out_channels=self.unet_out_channels,
                           planes=unet.planes, layers=unet.layers,
                           block=unet.block, remat=self.remat, name="unet")
        out = net(feats, levels, train=train)
        out = jax.nn.leaky_relu(out, negative_slope=0.01)
        out = SparseLinear(1024, name="regression_fc1")(out, levels[0].valid)
        out = jax.nn.leaky_relu(out, negative_slope=0.01)
        out = SparseLinear(self.num_classes, name="regression_fc2")(
            out, levels[0].valid)
        return out


class RobotNetVote(nn.Module):
    """Cross-section voting head: per-voxel 2- or 4-class logits."""

    backbone: str = "minkunet"
    in_channels: int = 3
    num_classes: int = 2  # 2 for ee_seg data, 4 otherwise (robotnet_vote.py:39)

    @nn.compact
    def __call__(self, feats, levels, joint_angles=None, train: bool = False):
        return RobotNetSegmentation(
            backbone=self.backbone,
            in_channels=self.in_channels,
            num_classes=self.num_classes,
            name="seg",
        )(feats, levels, train=train)
