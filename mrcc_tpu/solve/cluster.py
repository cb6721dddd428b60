"""Largest-cluster extraction (exact single-linkage) inside jit.

TPU-native replacement for sklearn AgglomerativeClustering(single linkage,
distance_threshold=0.06) as used by ClusterUtil.get_largest_cluster
(reference utils/output.py:13-28, applied to predicted-EE points in
inference_engine.py:429-434).

Method: EXACT single-linkage at threshold ``dist`` = connected components of
the graph {(i, j) : ||p_i - p_j|| < dist}.  Masked points are compacted into
a fixed ``capacity`` buffer, the full pairwise-distance adjacency is built
with one MXU matmul, and component labels are propagated to a fixed point
with min-over-neighbours sweeps + pointer jumping (O(log n) sweeps).  This
matches sklearn's result exactly (single linkage merges iff distance <
threshold), unlike grid-cell linkage approximations which can both split a
true cluster (points within dist landing 2 cells apart) and over-link
separate blobs — either of which can change which blob is "largest".

Cost: one [C, C] distance matrix + ``iterations`` masked min-reduces over it
— at C = 4096 that is ~16 M elements per sweep, trivial next to the
segmentation U-Net.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("capacity", "iterations"))
def largest_cluster_mask(points, mask, dist=0.06, capacity=2048,
                         iterations=16):
    """Boolean mask of the largest single-linkage cluster (exact).

    Args:
      points: [P, 3] points.
      mask: [P] validity (cluster over these points only).
      dist: linkage distance threshold (reference 0.06).
      capacity: static compaction capacity.  The first ``capacity`` masked
        points (in index order) participate; overflow points are excluded
        from the output mask (choose capacity >= expected EE point count).
      iterations: label-propagation sweeps; each combines a neighbour-min
        with pointer jumping, so convergence is O(log n) — 16 covers any
        graph up to 2^16 points of path length.

    Returns [P] bool — points belonging to the largest cluster.
    """
    p = points.shape[0]
    c = min(capacity, p)
    # compact masked rows to the front (stable keeps index order)
    order = jnp.argsort(~mask, axis=-1, stable=True)[:c]
    pts = jnp.take(points, order, axis=0)
    ok = jnp.take(mask, order, axis=0)

    # pairwise squared distances via one MXU matmul (f32 accumulation)
    sq = jnp.sum(pts * pts, axis=-1)
    g = jnp.dot(pts, pts.T, preferred_element_type=jnp.float32)
    d2 = sq[:, None] + sq[None, :] - 2.0 * g
    adj = (d2 < dist * dist) & ok[:, None] & ok[None, :]

    init = jnp.where(ok, jnp.arange(c, dtype=jnp.int32), c)

    def sweep(labels):
        nbr_min = jnp.min(jnp.where(adj, labels[None, :], c), axis=1)
        new = jnp.minimum(labels, nbr_min)
        # pointer jumping: a label is itself a row index, so hop to that
        # row's label — O(diameter) convergence becomes O(log diameter)
        hop = new[jnp.minimum(new, c - 1)]
        new = jnp.minimum(new, jnp.where(new < c, hop, c))
        return new

    # run to the FIXED POINT with an early exit (r5): real clouds converge
    # in ~4-6 sweeps; ``iterations`` stays the hard cap.  Same fixpoint as
    # the unconditional scan — while_loop is fine here (inference-only,
    # never differentiated).
    def cond(carry):
        labels, prev_done, it = carry
        return (~prev_done) & (it < iterations)

    def body(carry):
        labels, _, it = carry
        new = sweep(labels)
        return new, jnp.all(new == labels), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (init, False, 0))

    sizes = jax.ops.segment_sum(ok.astype(jnp.float32), labels,
                                num_segments=c + 1)
    best = jnp.argmin(jnp.where(jnp.arange(c + 1) < c, -sizes, jnp.inf))

    in_best = (labels == best) & ok
    return jnp.zeros((p,), bool).at[order].set(in_best)
