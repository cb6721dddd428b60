"""Metric-learning criterion: MultiSimilarity mining + triplet margin loss.

Parity: /root/reference/model/featurenet.py:30-34 (pytorch_metric_learning
``MultiSimilarityMiner()`` + ``TripletMarginLoss()`` with library defaults:
miner epsilon 0.1, triplet margin 0.05, euclidean distances).

Jit-safe fixed-shape formulation: instead of ragged mined index lists, the
miner produces [B, B] boolean pair masks and the loss averages the hinge
over all (anchor, mined-positive, mined-negative) triples.
"""

from __future__ import annotations

import jax.numpy as jnp


def pairwise_dist(emb):
    """Euclidean distance matrix [B, B]."""
    sq = jnp.sum(emb**2, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * emb @ emb.T
    return jnp.sqrt(jnp.maximum(d2, 1e-12))


def multi_similarity_miner(emb, labels, epsilon=0.1):
    """Hard pair mining (Wang et al. CVPR'19, pml defaults).

    Returns (pos_mask, neg_mask) [B, B]: positives harder than the hardest
    negative minus epsilon, negatives harder than the hardest positive plus
    epsilon (in distance space: pos with d_ap > min_neg_d - eps, neg with
    d_an < max_pos_d + eps).
    """
    d = pairwise_dist(emb)
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(labels.shape[0], dtype=bool)
    pos_pairs = same & ~eye
    neg_pairs = ~same

    big = jnp.asarray(1e12, d.dtype)
    min_neg = jnp.where(neg_pairs, d, big).min(axis=1, keepdims=True)
    max_pos = jnp.where(pos_pairs, d, -big).max(axis=1, keepdims=True)

    pos_mask = pos_pairs & (d > min_neg - epsilon)
    neg_mask = neg_pairs & (d < max_pos + epsilon)
    return pos_mask, neg_mask


def triplet_margin_loss(emb, labels, margin=0.05, epsilon=0.1):
    """Triplet hinge over mined pairs; mean over active triples."""
    d = pairwise_dist(emb)
    pos_mask, neg_mask = multi_similarity_miner(emb, labels, epsilon)
    # hinge[a, p, n] = relu(d_ap - d_an + margin)
    hinge = jnp.maximum(d[:, :, None] - d[:, None, :] + margin, 0.0)
    w = (pos_mask[:, :, None] & neg_mask[:, None, :]).astype(d.dtype)
    total = jnp.sum(hinge * w)
    return total / jnp.maximum(jnp.sum(w), 1.0)


def get_criterion():
    """(featurenet.py:30 ``get_criterion``) -> (loss_fn, miner_fn)."""
    return triplet_margin_loss, multi_similarity_miner
