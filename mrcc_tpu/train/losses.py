"""Training losses — all 10 types from the reference.

Parity: /root/reference/utils/loss.py:21-274 (``LossType`` + ``get_criterion``).
Each criterion has signature ``loss(y, y_pred, coords=None, coords_valid=None,
probs=None)`` where y/y_pred are [B, >=7] poses (WXYZ) and coords are the
per-item point/voxel coordinates some losses rotate ([B, N, 3] + validity
mask replaces the reference's ragged ``decomposed_coordinates``).

Reference quirks preserved on purpose (SURVEY.md §2.3):
- ``cos`` computes the cosine term over POSITIONS (y[:, :3]), not
  quaternions (loss.py:60) — kept faithfully.
- ``cos2`` with position enabled takes cosine similarity over the full
  7-dim pose vector (loss.py:86).
"""

from __future__ import annotations

import dataclasses
import enum
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..geometry.metrics import compute_pose_dist
from ..geometry.quaternion import qeuler, qnormalize
from ..geometry.transform import quat_to_matrix, rot6d_to_quat


class LossType(str, enum.Enum):
    MSE = "mse"
    COS = "cos"
    ANGLE = "angle"
    COS2 = "cos2"
    COS2_6D = "cos2_6d"
    WGEODESIC = "wgeodesic"
    SMOOTHL1 = "smoothl1"
    POSE = "pose"
    SHAPE_MATCH = "shape_match"
    POSE_MATCH = "pose_match"
    KP_POSE_MATCH = "kp_pose_match"


@dataclasses.dataclass
class LossConfig:
    """Replaces the STRUCTURE config keys the criterion factory reads."""

    loss_type: LossType = LossType.COS2
    reduction: str = "mean"  # 'mean' | 'sum'
    compute_confidence: bool = False
    disable_position: bool = False
    disable_orientation: bool = False
    position_threshold: float = 0.03
    position_ignore_threshold: float = 0.05
    angle_diff_threshold: float = 0.24
    angle_diff_ignore_threshold: float = 0.4
    ignore_label: int = -100
    # symmetry-aware rotation term (r5, VERDICT r4 #7): when set ('x' |
    # 'y' | 'z'), the COS2_6D rotation/confidence terms take the BETTER of
    # the label quaternion and its 180°-about-axis body-frame flip — the
    # two-finger gripper is ~invariant under the z flip, so forcing one
    # branch creates the bimodal tail the r4 held-out runs measured (max
    # 0.55 rad).  Train-time twin of solve/symmetry.py's test-time
    # disambiguation; the reference has no equivalent.
    symmetry_flip_axis: Optional[str] = None


def _reduce(x, reduction):
    return jnp.sum(x) if reduction == "sum" else jnp.mean(x)


def _mse(a, b, reduction):
    return _reduce((a - b) ** 2, reduction)


def _cossim(a, b, eps=1e-6):
    na = jnp.maximum(jnp.linalg.norm(a, axis=-1), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=-1), eps)
    return jnp.sum(a * b, axis=-1) / (na * nb)


def _bce(pred, target, mask, reduction):
    """Masked binary cross-entropy (torch BCELoss semantics on sigmoided
    inputs)."""
    eps = 1e-7
    p = jnp.clip(pred, eps, 1 - eps)
    ll = -(target * jnp.log(p) + (1 - target) * jnp.log1p(-p))
    m = mask.astype(ll.dtype)
    denom = jnp.maximum(m.sum(), 1.0)
    return ll @ m / denom if reduction == "mean" else jnp.sum(ll * m)


def angle_loss(q_expected, q_pred, reduction="mean"):
    """Euler-wrap angle loss (loss.py:47)."""
    e1 = qeuler(q_expected, order="zyx", epsilon=1e-6)
    e2 = qeuler(q_pred, order="zyx", epsilon=1e-6)
    d = jnp.remainder(e2 - e1 + jnp.pi, 2 * jnp.pi) - jnp.pi
    return _reduce(jnp.abs(d), reduction)


def cos_loss(y, y_pred, cfg: LossConfig, **_):
    """(loss.py:58) — note the positions-in-both-terms quirk."""
    loss_coor = _mse(y[:, :3], y_pred[:, :3], cfg.reduction)
    loss_rot = 1.0 - _cossim(y[:, :3], y_pred[:, :3])
    return _reduce(loss_rot, cfg.reduction) + loss_coor


def mse_loss(y, y_pred, cfg: LossConfig, **_):
    return _mse(y[:, : y_pred.shape[-1]], y_pred, cfg.reduction)


def default_loss(y, y_pred, cfg: LossConfig, **_):
    """gamma=50 pos-MSE + euler angle loss (loss.py:66)."""
    return 50.0 * _mse(y[:, :3], y_pred[:, :3], cfg.reduction) + angle_loss(
        y[:, 3:7], y_pred[:, 3:7], cfg.reduction)


def cos2_loss(y, y_pred, cfg: LossConfig, **_):
    """The default training loss (loss.py:74)."""
    loss_coor = 0.0
    if not cfg.disable_position:
        loss_coor = _mse(y[:, :3], y_pred[:, :3], cfg.reduction)
    loss_rot = 0.0
    if not cfg.disable_orientation:
        if not cfg.disable_position:
            loss_rot = _reduce(1.0 - _cossim(y[:, :7], y_pred[:, :7]),
                               cfg.reduction)
        else:
            loss_rot = _mse(y[:, 3:7], y_pred[:, 3:7], cfg.reduction)
        loss_rot = loss_rot * 2.0  # gamma_cos

    loss_conf = 0.0
    if cfg.compute_confidence:
        _, dist_position, _, angle_diff = compute_pose_dist(y[:, :7],
                                                            y_pred[:, :7])
        pos_idx = (dist_position < cfg.position_threshold) | (
            dist_position > cfg.position_ignore_threshold)
        pos_target = (dist_position < cfg.position_threshold).astype(
            y_pred.dtype)
        loss_conf += _bce(y_pred[:, 7], pos_target, pos_idx, cfg.reduction)

        ang_idx = (angle_diff < cfg.angle_diff_threshold) | (
            angle_diff > cfg.angle_diff_ignore_threshold)
        ang_target = (angle_diff < cfg.angle_diff_threshold).astype(
            y_pred.dtype)
        loss_conf += _bce(y_pred[:, 8], ang_target, ang_idx, cfg.reduction)

        all_idx = pos_idx & ang_idx
        all_target = pos_target * ang_target
        loss_conf += _bce(y_pred[:, 9], all_target, all_idx, cfg.reduction)

    return loss_rot + loss_coor + loss_conf


_FLIP_Q = {"x": (0.0, 1.0, 0.0, 0.0),
           "y": (0.0, 0.0, 1.0, 0.0),
           "z": (0.0, 0.0, 0.0, 1.0)}


def _symmetry_label(y_q, q_pred, axis):
    """Per-item better branch of the label under the 180°-about-``axis``
    body-frame flip: argmax_b |<y_q ∘ flip_b, q_pred>| (b in {id, flip}).

    WXYZ body-frame post-multiply — the convention of
    solve/symmetry.py::disambiguate_flip (its test-time twin)."""
    from ..geometry.quaternion import qmul

    flip = jnp.broadcast_to(jnp.asarray(_FLIP_Q[axis], y_q.dtype),
                            y_q.shape)
    y_flip = qmul(y_q, flip)
    i0 = jnp.abs(jnp.sum(y_q * q_pred, axis=-1, keepdims=True))
    i1 = jnp.abs(jnp.sum(y_flip * q_pred, axis=-1, keepdims=True))
    return jnp.where(i1 > i0, y_flip, y_q)


def cos2_6d_loss(y, y_pred, cfg: LossConfig, **_):
    """cos2 with a continuous 6D rotation head (opt-in, ROADMAP #8).

    y stays the reference 7-DoF [pos, wxyz quat] label; y_pred is
    [pos(3), 6d(6), conf(3)?].  The 6D block is Gram-Schmidt-orthonormalized
    and compared to the label rotation geodesically; position and the
    optional confidence heads reuse the cos2 machinery on the converted
    quaternion (so thresholds keep the reference semantics,
    loss.py:74-116).  With ``symmetry_flip_axis`` set, the rotation AND
    confidence terms target the better gripper-symmetry branch
    (stop-gradient branch choice)."""
    q_pred = rot6d_to_quat(y_pred[:, 3:9])
    y_q = qnormalize(y[:, 3:7])
    if cfg.symmetry_flip_axis is not None:
        y_q = jax.lax.stop_gradient(
            _symmetry_label(y_q, q_pred, cfg.symmetry_flip_axis))
    loss_coor = 0.0
    if not cfg.disable_position:
        loss_coor = _mse(y[:, :3], y_pred[:, :3], cfg.reduction)
    loss_rot = 0.0
    if not cfg.disable_orientation:
        # |<q1, q2>| is cos(theta/2): sign-invariant smooth geodesic proxy
        inner = jnp.abs(jnp.sum(y_q * q_pred, axis=-1))
        loss_rot = 2.0 * _reduce(1.0 - inner, cfg.reduction)

    loss_conf = 0.0
    if cfg.compute_confidence:
        y_sym = (y[:, :7] if cfg.symmetry_flip_axis is None
                 else jnp.concatenate([y[:, :3], y_q], axis=-1))
        y_pred7 = jnp.concatenate([y_pred[:, :3], q_pred], axis=-1)
        _, dist_position, _, angle_diff = compute_pose_dist(y_sym,
                                                            y_pred7)
        pos_idx = (dist_position < cfg.position_threshold) | (
            dist_position > cfg.position_ignore_threshold)
        pos_target = (dist_position < cfg.position_threshold).astype(
            y_pred.dtype)
        loss_conf += _bce(y_pred[:, 9], pos_target, pos_idx, cfg.reduction)

        ang_idx = (angle_diff < cfg.angle_diff_threshold) | (
            angle_diff > cfg.angle_diff_ignore_threshold)
        ang_target = (angle_diff < cfg.angle_diff_threshold).astype(
            y_pred.dtype)
        loss_conf += _bce(y_pred[:, 10], ang_target, ang_idx, cfg.reduction)

        all_idx = pos_idx & ang_idx
        all_target = pos_target * ang_target
        loss_conf += _bce(y_pred[:, 11], all_target, all_idx, cfg.reduction)

    return loss_rot + loss_coor + loss_conf


def _geodesic_rot(y, y_pred, cfg):
    yn = qnormalize(y[:, 3:7])
    pn = qnormalize(y_pred[:, 3:7])
    inner = jnp.sum(yn * pn, axis=-1)
    return _reduce(jnp.arccos(jnp.clip((inner - 1.0) * 0.5, -1.0, 1.0)),
                   cfg.reduction)


def wgeodesic_loss(y, y_pred, cfg: LossConfig, **_):
    """(loss.py:118)"""
    loss_coor = 0.0 if cfg.disable_position else _mse(
        y[:, :3], y_pred[:, :3], cfg.reduction)
    loss_rot = 0.0 if cfg.disable_orientation else _geodesic_rot(y, y_pred, cfg)
    return loss_rot + loss_coor


def smoothl1_loss(y, y_pred, cfg: LossConfig, **_):
    """(loss.py:142): huber position + geodesic rotation."""
    loss_coor = 0.0
    if not cfg.disable_position:
        d = y[:, :3] - y_pred[:, :3]
        ad = jnp.abs(d)
        huber = jnp.where(ad < 1.0, 0.5 * d**2, ad - 0.5)
        loss_coor = _reduce(huber, cfg.reduction)
    loss_rot = 0.0 if cfg.disable_orientation else _geodesic_rot(y, y_pred, cfg)
    return loss_rot + loss_coor


def _masked_mean_over_items(per_item, reduction, batch):
    total = jnp.sum(per_item)
    if reduction == "mean":
        return total / batch
    return total


def pose_loss(y, y_pred, cfg: LossConfig, coords=None, coords_valid=None, **_):
    """Rotate per-item coords by gt vs pred quaternion (loss.py:166)."""
    rot = quat_to_matrix(y[:, 3:7], normalize=False)
    rot_pred = quat_to_matrix(y_pred[:, 3:7], normalize=False)
    yt = jnp.einsum("bij,bnj->bni", rot, coords)
    pt = jnp.einsum("bij,bnj->bni", rot_pred, coords)
    sq = jnp.sum((pt - yt) ** 2, axis=-1)  # [B, N]
    v = coords_valid.astype(sq.dtype)
    n = jnp.maximum(v.sum(axis=-1), 1.0)
    per_item = (sq * v).sum(axis=-1) / (2.0 * n)
    out = _masked_mean_over_items(per_item, cfg.reduction, y.shape[0])
    if cfg.reduction == "mean":
        out = out * 1e3  # loss.py:186 "to prevent NaN error"
    return out


def shape_match_loss(y, y_pred, cfg: LossConfig, coords=None,
                     coords_valid=None, **_):
    """Chamfer-style min-match of rotated clouds (loss.py:190).

    O(N²) per item — use modest N (the reference runs it on EE crops)."""
    rot = quat_to_matrix(y[:, 3:7], normalize=False)
    rot_pred = quat_to_matrix(y_pred[:, 3:7], normalize=False)
    yt = jnp.einsum("bij,bnj->bni", rot, coords)
    pt = jnp.einsum("bij,bnj->bni", rot_pred, coords)
    d2 = jnp.sum((pt[:, :, None, :] - yt[:, None, :, :]) ** 2, axis=-1)
    big = jnp.asarray(1e30, d2.dtype)
    d2 = jnp.where(coords_valid[:, None, :], d2, big)
    mins = jnp.min(d2, axis=-1)  # [B, N] per pred point
    v = coords_valid.astype(mins.dtype)
    n = jnp.maximum(v.sum(axis=-1), 1.0)
    per_item = (mins * v).sum(axis=-1) / (2.0 * n)
    return _masked_mean_over_items(per_item, cfg.reduction, y.shape[0])


def pose_match_loss(y, y_pred, cfg: LossConfig, coords=None,
                    coords_valid=None, **_):
    """L1 match of fully-posed clouds (loss.py:211)."""
    rot = quat_to_matrix(y[:, 3:7], normalize=False)
    rot_pred = quat_to_matrix(y_pred[:, 3:7], normalize=False)
    yt = jnp.einsum("bij,bnj->bni", rot, coords) + y[:, None, :3]
    pt = jnp.einsum("bij,bnj->bni", rot_pred, coords) + y_pred[:, None, :3]
    norms = jnp.sum(jnp.abs(pt - yt), axis=-1)  # ord=1 over xyz
    v = coords_valid.astype(norms.dtype)
    n = jnp.maximum(v.sum(axis=-1), 1.0)
    per_item = (norms * v).sum(axis=-1) / n
    return _masked_mean_over_items(per_item, cfg.reduction, y.shape[0])


def kp_pose_match_loss(y, y_pred, cfg: LossConfig, coords=None,
                       coords_valid=None, probs=None, **_):
    """Probability-weighted pose match over keypoints (loss.py:229)."""
    rot = quat_to_matrix(y[:, 3:7], normalize=False)
    rot_pred = quat_to_matrix(y_pred[:, 3:7], normalize=False)
    yt = jnp.einsum("bij,bnj->bni", rot, coords) + y[:, None, :3]
    pt = jnp.einsum("bij,bnj->bni", rot_pred, coords) + y_pred[:, None, :3]
    norms = jnp.linalg.norm(pt - yt, axis=-1)
    if probs is None:
        probs = jnp.ones_like(norms)
    v = coords_valid.astype(norms.dtype)
    n = jnp.maximum(v.sum(axis=-1), 1.0)
    per_item = (((probs * norms) ** 2) * v).sum(axis=-1) / (2.0 * n)
    return _masked_mean_over_items(per_item, cfg.reduction, y.shape[0])


def segmentation_loss(logits, labels, valid, ignore_label=-100):
    """Cross-entropy with ignore_index (train_segmentation.py:199 /
    robotnet_vote.py:74)."""
    keep = valid & (labels != ignore_label)
    safe = jnp.where(keep, labels, 0)
    ll = -jnp.take_along_axis(jax.nn.log_softmax(logits, axis=-1),
                              safe[..., None], axis=-1)[..., 0]
    m = keep.astype(ll.dtype)
    return (ll * m).sum() / jnp.maximum(m.sum(), 1.0)


_REGISTRY = {
    LossType.MSE: mse_loss,
    LossType.COS: cos_loss,
    LossType.ANGLE: default_loss,
    LossType.COS2: cos2_loss,
    LossType.COS2_6D: cos2_6d_loss,
    LossType.WGEODESIC: wgeodesic_loss,
    LossType.SMOOTHL1: smoothl1_loss,
    LossType.POSE: pose_loss,
    LossType.SHAPE_MATCH: shape_match_loss,
    LossType.POSE_MATCH: pose_match_loss,
    LossType.KP_POSE_MATCH: kp_pose_match_loss,
}


def get_criterion(cfg: LossConfig = None):
    """Criterion factory (loss.py:34 ``get_criterion``)."""
    cfg = cfg or LossConfig()
    loss_type = LossType(cfg.loss_type)
    fn = _REGISTRY[loss_type]
    return partial(fn, cfg=cfg)
