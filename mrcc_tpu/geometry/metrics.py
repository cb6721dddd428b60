"""Pose / segmentation / keypoint metrics.

Parity target: /root/reference/utils/metrics.py.  All pose metrics are pure
JAX (batched, jit-safe).  ``compute_pose_dist`` does NOT mutate its inputs
(the reference mutates ``gt`` in place — metrics.py:21 — a documented bug we
consciously fix).
"""

from __future__ import annotations

import jax.numpy as jnp

from .quaternion import qconj, qmul, qnormalize
from .transform import quat_to_matrix

EPS = 1e-7


def compute_pose_dist(gt, pred, position_voxelization=1.0):
    """Batched pose distances, parity with metrics.py:18.

    Args:
      gt:   (B, 7) [x,y,z,qw,qx,qy,qz]
      pred: (B, >=7) predictions (confidence columns beyond 7 are ignored)

    Returns:
      (dist, dist_position, dist_orientation, angle_diff), each (B,).
    """
    gt = jnp.asarray(gt)
    pred = jnp.asarray(pred)[..., :7]
    position = gt[..., :3] * position_voxelization
    position_pred = pred[..., :3] * position_voxelization
    orientation = gt[..., 3:7]
    orientation_pred = pred[..., 3:7]

    gt_scaled = jnp.concatenate([position, orientation], axis=-1)
    pred_scaled = jnp.concatenate([position_pred, orientation_pred], axis=-1)

    dist = jnp.linalg.norm(gt_scaled - pred_scaled, axis=-1)
    dist_position = jnp.linalg.norm(position - position_pred, axis=-1)
    dist_orientation = jnp.minimum(
        jnp.linalg.norm(orientation - orientation_pred, axis=-1),
        jnp.linalg.norm(orientation + orientation_pred, axis=-1),
    )
    gt_on = qnormalize(orientation)
    pr_on = qnormalize(orientation_pred)
    inner = jnp.sum(gt_on * pr_on, axis=-1)
    angle_diff = jnp.arccos(jnp.clip(2.0 * inner**2 - 1.0, -1.0, 1.0))
    return dist, dist_position, dist_orientation, angle_diff


def compute_pose_metrics(gt, pred):
    """Single-pose metrics dict, parity with metrics.py:110.

    Uses the atan2 form of the relative angle; the reference comments this is
    numerically identical to the acos form of compute_pose_dist.
    """
    gt = jnp.asarray(gt)
    pred = jnp.asarray(pred)
    dist_position = jnp.linalg.norm(gt[..., :3] - pred[..., :3])
    gt_rot = qnormalize(gt[..., 3:7])
    pred_rot = qnormalize(pred[..., 3:7])
    q_rel = qmul(gt_rot, qconj(pred_rot))
    angle = jnp.abs(
        2.0 * jnp.arctan2(jnp.linalg.norm(q_rel[..., 1:], axis=-1), q_rel[..., 0])
    )
    angle = jnp.minimum(angle, 2 * jnp.pi - angle)
    return {"dist_position": dist_position, "angle_diff": angle}


def compute_segmentation_metrics(gt, pred, num_classes=3, mask=None,
                                 classes=("background", "arm", "ee")):
    """Per-class precision/recall/accuracy + the reference's overall summary.

    Parity with metrics.py:51, including its quirks: when a class has zero
    false positives, precision is reported as 1 (``int(fp==0) or ...``), same
    for recall; overall "accuracy" is (sensitivity + specificity) / 2 over the
    class-summed confusion counts.

    Args:
      gt, pred: integer class arrays of the same shape.
      mask: optional validity mask for padded buffers.
    Returns:
      dict mirroring the reference structure (JAX scalars; call
      ``jax.device_get`` or float() on values for reporting).
    """
    gt = jnp.asarray(gt)
    pred = jnp.asarray(pred)
    if mask is None:
        mask = jnp.ones(gt.shape, dtype=bool)
    mask = jnp.asarray(mask)
    total = jnp.sum(mask)

    results = {"class_results": {}}
    precisions = []
    recalls = []
    tp_sum = tn_sum = fp_sum = fn_sum = 0.0
    for ci, cn in enumerate(classes[:num_classes]):
        gt_c = jnp.logical_and(gt == ci, mask)
        pr_c = jnp.logical_and(pred == ci, mask)
        tp = jnp.sum(jnp.logical_and(gt_c, pr_c)).astype(jnp.float32)
        union = jnp.sum(jnp.logical_or(gt_c, pr_c)).astype(jnp.float32)
        tn = total.astype(jnp.float32) - union
        fp = jnp.sum(pr_c).astype(jnp.float32) - tp
        fn = jnp.sum(gt_c).astype(jnp.float32) - tp

        tp_sum = tp_sum + tp
        tn_sum = tn_sum + tn
        fp_sum = fp_sum + fp
        fn_sum = fn_sum + fn

        accuracy = (tp + tn) / jnp.maximum(tp + tn + fp + fn, 1.0)
        precision = jnp.where(fp == 0, 1.0, tp / jnp.maximum(tp + fp, 1.0))
        recall = jnp.where(fn == 0, 1.0, tp / jnp.maximum(tp + fn, 1.0))

        results["class_results"][cn] = {
            "accuracy": accuracy,
            "precision": precision,
            "recall": recall,
        }
        precisions.append(precision)
        recalls.append(recall)

    sensitivity = tp_sum / jnp.maximum(tp_sum + fn_sum, 1.0)
    specificity = tn_sum / jnp.maximum(tn_sum + fp_sum, 1.0)
    results["accuracy"] = (sensitivity + specificity) / 2.0
    results["precision"] = jnp.mean(jnp.stack(precisions))
    results["recall"] = jnp.mean(jnp.stack(recalls))
    return results


def compute_kp_error(gt_coords, kp_coords, kp_classes):
    """Mean L2 error of predicted keypoints vs gt keypoints of same class.

    Parity with metrics.py:130 (the <2 guard returning 100 is handled by the
    caller in jit contexts).
    """
    gt_sel = jnp.asarray(gt_coords)[jnp.asarray(kp_classes)]
    return jnp.linalg.norm(gt_sel - jnp.asarray(kp_coords), axis=-1).mean()


def compute_add(points, gt_pose, pred_pose):
    """Average Distance of Model Points (ADD), parity with metrics.py:139."""
    points = jnp.asarray(points)
    gt_pose = jnp.asarray(gt_pose)
    pred_pose = jnp.asarray(pred_pose)
    gt_r = quat_to_matrix(gt_pose[..., 3:7])
    pr_r = quat_to_matrix(pred_pose[..., 3:7])
    gt_pts = jnp.einsum("...ij,...nj->...ni", gt_r, points) + gt_pose[..., None, :3]
    pr_pts = jnp.einsum("...ij,...nj->...ni", pr_r, points) + pred_pose[..., None, :3]
    return jnp.linalg.norm(gt_pts - pr_pts, axis=-1).mean(axis=-1)


def rotational_diff(q1, q2, degree=True):
    """2*acos(|<q1,q2>|), optionally degrees (metrics.py:153)."""
    diff = 2.0 * jnp.arccos(jnp.clip(jnp.abs(jnp.sum(q1 * q2, axis=-1)), 0.0, 1.0))
    return diff * 57.2958 if degree else diff


def translational_diff(t1, t2, cm=True):
    """Euclidean translation difference, optionally cm (metrics.py:167)."""
    d = jnp.linalg.norm(jnp.asarray(t1) - jnp.asarray(t2), axis=-1)
    return d * 100.0 if cm else d
