"""PointNet / PointNet++ dense models (channel-last, TPU layout).

Parity:
- PointNet2SSG        (model/pointnet2.py:9-43): 4x SetAbstraction
  (1024/256/64/16 centroids, radii .1-.8) + 4x FeaturePropagation ->
  per-point keypoint logits [B, N, K].
- PointNet2MSGEncoder (model/pointnet2.py:46-77): multi-scale-group encoder.
- PointNet            (model/pointnet.py:8-36): 1x1 conv stack -> global max
  -> MLP head (used by the kp_to_pose stage).

Inputs are [B, N, C] channel-last (the reference uses [B, C, N]; layout
chosen for TPU lanes).  The caller samples exactly N points (2048) as the
reference's dense dataset does.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.points import (
    sample_and_group,
    sample_and_group_all,
    three_nn_interpolate,
)


class PointMLP(nn.Module):
    """Shared 1x1-conv + BN + ReLU stack over trailing channels."""

    channels: Sequence[int]

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, use_bias=False, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f"bn{i}")(x)
            x = jax.nn.relu(x)
        return x


class SetAbstraction(nn.Module):
    """(pointnet2_utils.py:163) FPS -> ball group -> shared MLP -> max."""

    npoint: Optional[int]
    radius: Optional[float]
    nsample: Optional[int]
    mlp: Sequence[int]
    group_all: bool = False

    @nn.compact
    def __call__(self, xyz, points, train: bool = False):
        if self.group_all:
            new_xyz, grouped = sample_and_group_all(xyz, points)
        else:
            new_xyz, grouped = sample_and_group(
                self.npoint, self.radius, self.nsample, xyz, points)
        feats = PointMLP(self.mlp, name="mlp")(grouped, train=train)
        return new_xyz, feats.max(axis=2)


class SetAbstractionMsg(nn.Module):
    """(pointnet2_utils.py:205) multi-scale grouping."""

    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]

    @nn.compact
    def __call__(self, xyz, points, train: bool = False):
        from ..ops.points import farthest_point_sample, index_points, query_ball_point

        fps_idx = farthest_point_sample(xyz, self.npoint)
        new_xyz = index_points(xyz, fps_idx)
        outs = []
        for i, (r, k, mlp) in enumerate(zip(self.radii, self.nsamples,
                                            self.mlps)):
            idx = query_ball_point(r, k, xyz, new_xyz)
            grouped_xyz = index_points(xyz, idx) - new_xyz[:, :, None, :]
            if points is not None:
                grouped = jnp.concatenate(
                    [grouped_xyz, index_points(points, idx)], axis=-1)
            else:
                grouped = grouped_xyz
            f = PointMLP(mlp, name=f"mlp{i}")(grouped, train=train)
            outs.append(f.max(axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class FeaturePropagation(nn.Module):
    """(pointnet2_utils.py:267) 3-NN interpolate + skip concat + MLP."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz_fine, xyz_coarse, feats_fine, feats_coarse,
                 train: bool = False):
        if xyz_coarse.shape[1] == 1:
            interp = jnp.broadcast_to(
                feats_coarse, (xyz_fine.shape[0], xyz_fine.shape[1],
                               feats_coarse.shape[-1]))
        else:
            interp = three_nn_interpolate(xyz_fine, xyz_coarse, feats_coarse)
        if feats_fine is not None:
            interp = jnp.concatenate([feats_fine, interp], axis=-1)
        return PointMLP(self.mlp, name="mlp")(interp, train=train)


class PointNet2SSG(nn.Module):
    """Per-point keypoint logits (model/pointnet2.py:9)."""

    num_classes: int = 10
    in_channels: int = 3  # extra feature channels beyond xyz

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, N, 3+in_channels] with xyz first."""
        l0_xyz = x[..., :3]
        l0_points = x
        l1_xyz, l1 = SetAbstraction(1024, 0.1, 32, (32, 32, 64),
                                    name="sa1")(l0_xyz, l0_points, train)
        l2_xyz, l2 = SetAbstraction(256, 0.2, 32, (64, 64, 128),
                                    name="sa2")(l1_xyz, l1, train)
        l3_xyz, l3 = SetAbstraction(64, 0.4, 32, (128, 128, 256),
                                    name="sa3")(l2_xyz, l2, train)
        l4_xyz, l4 = SetAbstraction(16, 0.8, 32, (256, 256, 512),
                                    name="sa4")(l3_xyz, l3, train)

        l3 = FeaturePropagation((256, 256), name="fp4")(l3_xyz, l4_xyz, l3, l4,
                                                        train)
        l2 = FeaturePropagation((256, 256), name="fp3")(l2_xyz, l3_xyz, l2, l3,
                                                        train)
        l1 = FeaturePropagation((256, 128), name="fp2")(l1_xyz, l2_xyz, l1, l2,
                                                        train)
        l0 = FeaturePropagation((128, 128, 128), name="fp1")(
            l0_xyz, l1_xyz, None, l1, train)

        h = nn.Dense(128, name="conv1")(l0)
        h = nn.BatchNorm(use_running_average=not train, name="bn1")(h)
        h = jax.nn.relu(h)
        h = nn.Dropout(0.5, deterministic=not train)(h)
        logits = nn.Dense(self.num_classes, name="conv2")(h)
        return logits, l4


class PointNet2MSGEncoder(nn.Module):
    """Classification-style MSG encoder (model/pointnet2.py:46)."""

    num_classes: int
    normal_channel: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        xyz = x[..., :3]
        norm = x[..., 3:] if self.normal_channel else None
        l1_xyz, l1 = SetAbstractionMsg(
            512, (0.1, 0.2, 0.4), (16, 32, 128),
            ((32, 32, 64), (64, 64, 128), (64, 96, 128)),
            name="sa1")(xyz, norm, train)
        l2_xyz, l2 = SetAbstractionMsg(
            128, (0.2, 0.4, 0.8), (32, 64, 128),
            ((64, 64, 128), (128, 128, 256), (128, 128, 256)),
            name="sa2")(l1_xyz, l1, train)
        _, l3 = SetAbstraction(None, None, None, (256, 512, 1024),
                               group_all=True, name="sa3")(l2_xyz, l2, train)
        h = l3[:, 0]
        h = nn.Dense(512, name="fc1")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn1")(h)
        h = jax.nn.relu(h)
        h = nn.Dropout(0.4, deterministic=not train)(h)
        h = nn.Dense(256, name="fc2")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn2")(h)
        h = jax.nn.relu(h)
        h = nn.Dropout(0.5, deterministic=not train)(h)
        return nn.Dense(self.num_classes, name="fc3")(h), l3[:, 0]


class PointNet(nn.Module):
    """Vanilla PointNet regressor (model/pointnet.py:8) — used by
    train_kp_to_pose to map keypoints+probabilities to a 7-DoF pose."""

    out_channels: int
    embedding_channel: int = 1024

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, N, C] channel-last."""
        for i, c in enumerate((64, 64, 64, 128, self.embedding_channel)):
            x = nn.Dense(c, use_bias=False, name=f"conv{i + 1}")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f"bn{i + 1}")(x)
            x = jax.nn.relu(x)
        x = x.max(axis=1)  # global max pool over points
        x = nn.Dense(512, use_bias=False, name="linear1")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn6")(x)
        x = jax.nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.out_channels, name="linear2")(x)
