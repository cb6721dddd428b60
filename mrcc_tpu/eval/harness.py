"""Evaluation harnesses — the test*.py scripts' logic as library functions.

Parity targets:
- evaluate_pose          (test.py:37-145): per-instance pose distances over a
  split, per-position + overall summaries, JSON dump.
- evaluate_segmentation  (test_segmentation.py:58-110): per-instance
  field->sparse->slice inference + segmentation metrics.
- evaluate_key_points    (test_key_points.py:62-81): per-class keypoint L2
  error vs gt keypoints.
- evaluate_vote          (test_vote.py:39-106): vote-center distance.

All heads run their whole batch through one jitted program; the summaries
are host-side numpy.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.labels import get_6_key_points, get_key_points
from ..geometry.metrics import (
    compute_add,
    compute_pose_dist,
    compute_segmentation_metrics,
)
from ..solve import key_point_predictions, pred_center
from ..sparse import build_hierarchy, slice_to_points, voxelize


def _summary(values):
    values = np.asarray(values, np.float64)
    if len(values) == 0:
        return {"count": 0}
    return {
        "count": int(len(values)),
        "avg": float(values.mean()),
        "min": float(values.min()),
        "max": float(values.max()),
        "med": float(np.median(values)),
        "std": float(values.std()),
    }


def _forward_factory(model, variables, data_cfg, voxel_capacity,
                     with_labels=False):
    caps = (voxel_capacity, max(voxel_capacity // 2, 64),
            max(voxel_capacity // 4, 64), max(voxel_capacity // 8, 64))

    # variables are passed as jit ARGUMENTS (closure capture would embed the
    # weights as HLO constants — breaks remote compilation on large models)
    @jax.jit
    def forward_impl(variables, points, feats, mask, labels=None):
        vox, pv, vlabels = voxelize(points, feats, mask,
                                    data_cfg.quantization_size,
                                    voxel_capacity, labels=labels)
        levels = build_hierarchy(vox, 4, capacities=caps)
        out = model.apply(variables, vox.feats, levels, train=False)
        return out, pv, vox, vlabels

    def forward(points, feats, mask, labels=None):
        return forward_impl(variables, points, feats, mask, labels)

    return forward


def evaluate_pose(model, variables, dataset, voxel_capacity=4096,
                  batch_size=8, position_voxelization=1.0, out_path=None):
    """Pose-regression eval (test.py parity): returns dict with per-instance
    records and per-position/overall summaries."""
    forward = _forward_factory(model, variables, dataset.cfg, voxel_capacity)
    records = []
    for batch in dataset.batches(batch_size, shuffle=False):
        out, _, _, _ = forward(jnp.asarray(batch["points"]),
                               jnp.asarray(batch["feats"]),
                               jnp.asarray(batch["mask"]))
        dist, dpos, dori, ang = compute_pose_dist(
            jnp.asarray(batch["pose"]), out[:, :7],
            position_voxelization=position_voxelization)
        for i, other in enumerate(batch["others"]):
            records.append({
                "file": str(other.get("filename", "")),
                "position": str(other.get("position", "p1")),
                "dist": float(dist[i]),
                "dist_position": float(dpos[i]),
                "dist_orientation": float(dori[i]),
                "angle_diff": float(ang[i]),
            })
    by_pos = defaultdict(list)
    for r in records:
        by_pos[r["position"]].append(r)
    result = {
        "instances": records,
        "overall": {k: _summary([r[k] for r in records])
                    for k in ("dist_position", "angle_diff")},
        "positions": {p: {k: _summary([r[k] for r in rs])
                          for k in ("dist_position", "angle_diff")}
                      for p, rs in by_pos.items()},
    }
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)
    return result


def evaluate_segmentation(model, variables, dataset, voxel_capacity=8192,
                          batch_size=4, num_classes=3, out_path=None):
    """Segmentation eval (test_segmentation.py parity): per-instance
    precision/recall/accuracy on point labels via voxel slice-back."""
    forward = _forward_factory(model, variables, dataset.cfg, voxel_capacity)
    records = []
    for batch in dataset.batches(batch_size, shuffle=False):
        logits, pv, _, _ = forward(jnp.asarray(batch["points"]),
                                   jnp.asarray(batch["feats"]),
                                   jnp.asarray(batch["mask"]))
        pt_logits = slice_to_points(logits, pv, fill_value=-1e9)
        preds = np.asarray(jnp.argmax(pt_logits, axis=-1))
        for i, other in enumerate(batch["others"]):
            m = batch["mask"][i]
            gt = batch["labels"][i][m]
            pr = preds[i][m]
            res = compute_segmentation_metrics(gt, pr,
                                               num_classes=num_classes)
            records.append({
                "file": str(other.get("filename", "")),
                "position": str(other.get("position", "p1")),
                "accuracy": float(res["accuracy"]),
                "precision": float(res["precision"]),
                "recall": float(res["recall"]),
                "class_results": {
                    cn: {k: float(v) for k, v in cr.items()}
                    for cn, cr in res["class_results"].items()},
            })
    result = {
        "instances": records,
        "overall": {k: _summary([r[k] for r in records])
                    for k in ("accuracy", "precision", "recall")},
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)
    return result


def evaluate_key_points(model, variables, dataset, voxel_capacity=4096,
                        batch_size=8, conf_threshold=0.75, num_keypoints=6,
                        out_path=None):
    """Keypoint eval (test_key_points.py parity): mean L2 of predicted
    keypoints vs gt geometric keypoints."""
    forward = _forward_factory(model, variables, dataset.cfg, voxel_capacity)
    gen = get_6_key_points if num_keypoints == 6 else get_key_points
    records = []
    for batch in dataset.batches(batch_size, shuffle=False):
        logits, pv, _, _ = forward(jnp.asarray(batch["points"]),
                                   jnp.asarray(batch["feats"]),
                                   jnp.asarray(batch["mask"]))
        pt_logits = slice_to_points(logits, pv, fill_value=-1e9)
        kp_idx, kp_found, _ = jax.vmap(
            partial(key_point_predictions, conf_threshold=conf_threshold)
        )(pt_logits, jnp.asarray(batch["mask"]))
        kp_idx = np.asarray(kp_idx)
        kp_found = np.asarray(kp_found)
        for i, other in enumerate(batch["others"]):
            pts = batch["points"][i]
            gt_kps, gt_idx = gen(pts[batch["mask"][i]], batch["pose"][i])
            if len(gt_kps) == 0:
                continue
            found = np.where(kp_found[i])[0]
            if len(found) == 0:
                records.append({"file": str(other.get("filename", "")),
                                "kp_error": 100.0, "found": 0})
                continue
            pred_coords = pts[kp_idx[i][found]]
            err = np.linalg.norm(gt_kps[found] - pred_coords, axis=-1).mean()
            records.append({"file": str(other.get("filename", "")),
                            "kp_error": float(err),
                            "found": int(len(found))})
    result = {"instances": records,
              "overall": {"kp_error": _summary([r["kp_error"]
                                                for r in records])}}
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)
    return result


def evaluate_vote(model, variables, dataset, voxel_capacity=4096,
                  batch_size=8, ee_r=0.02, out_path=None):
    """Vote eval (test_vote.py parity): distance between voted centre and gt
    EE position."""
    forward = _forward_factory(model, variables, dataset.cfg, voxel_capacity)
    records = []
    for batch in dataset.batches(batch_size, shuffle=False):
        logits, pv, _, _ = forward(jnp.asarray(batch["points"]),
                                   jnp.asarray(batch["feats"]),
                                   jnp.asarray(batch["mask"]))
        pt_logits = slice_to_points(logits, pv, fill_value=-1e9)
        centers = jax.vmap(partial(pred_center, ee_r=ee_r))(
            pt_logits, jnp.asarray(batch["points"]),
            jnp.asarray(batch["mask"]))
        centers = np.asarray(centers)
        for i, other in enumerate(batch["others"]):
            d = float(np.linalg.norm(centers[i] - batch["pose"][i][:3]))
            records.append({"file": str(other.get("filename", "")),
                            "center_dist": d})
    result = {"instances": records,
              "overall": {"center_dist": _summary([r["center_dist"]
                                                   for r in records])}}
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)
    return result
