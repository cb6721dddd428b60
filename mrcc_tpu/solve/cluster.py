"""Largest-cluster extraction (single-linkage equivalent) inside jit.

TPU-native replacement for sklearn AgglomerativeClustering(single linkage,
distance_threshold=0.06) as used by ClusterUtil.get_largest_cluster
(reference utils/output.py:13-28, applied to predicted-EE points in
inference_engine.py:429-434).

Method: voxel-grid connected components.  Points are binned into cells of
edge ``dist/sqrt(3)`` so that any two points within one cell are guaranteed
closer than ``dist``; cells are linked to their 26 neighbours (conservative
single-linkage superset at ~2*dist, adequate for separating the EE blob from
stray false positives, which is what the reference uses it for) and labels
are propagated to a fixed point with a bounded iteration loop.  Everything is
fixed-shape: O(P + V·27) per iteration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..sparse.hierarchy import K3_OFFSETS, _lookup, _neighbor_table_one
from ..sparse.types import COORD_OFFSET, KEY_PAD, pack_key


@partial(jax.jit, static_argnames=("capacity", "iterations"))
def largest_cluster_mask(points, mask, dist=0.06, capacity=2048,
                         iterations=10):
    """Boolean mask of the largest connected cluster.

    Args:
      points: [P, 3] points.
      mask: [P] validity.
      dist: linkage distance threshold (reference 0.06).
      capacity: static voxel capacity for the clustering grid.
      iterations: max label-propagation sweeps.  Each sweep combines a
        26-neighbour min with pointer jumping, so convergence is
        O(log diameter): 16 sweeps cover components with diameters far
        beyond any physical cluster at these grid sizes.

    Returns [P] bool — points belonging to the largest cluster.
    """
    cell = dist / jnp.sqrt(3.0)
    coords = jnp.floor(points / cell).astype(jnp.int32) + COORD_OFFSET
    in_range = jnp.all((coords >= 0) & (coords < 2 * COORD_OFFSET), axis=-1)
    ok = mask & in_range
    key = jnp.where(ok, pack_key(coords), KEY_PAD)

    skey = jnp.sort(key)
    first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    run_id = jnp.cumsum(first) - 1
    pt_ok = (skey < KEY_PAD) & (run_id < capacity)
    vid_sorted = jnp.where(pt_ok, run_id, capacity)
    ukey = jax.ops.segment_min(skey, vid_sorted, num_segments=capacity + 1)[:capacity]
    counts = jax.ops.segment_sum(jnp.ones_like(skey, dtype=jnp.float32),
                                 vid_sorted, num_segments=capacity + 1)[:capacity]
    vvalid = counts > 0
    ukey = jnp.where(vvalid, ukey, KEY_PAD)
    uoff = jnp.where(vvalid[:, None],
                     jnp.stack([(ukey >> 20) & 1023, (ukey >> 10) & 1023,
                                ukey & 1023], axis=-1), 0)

    nbr_idx, nbr_hit = _neighbor_table_one(uoff, ukey, vvalid, K3_OFFSETS)

    # label propagation: min label over 27-neighbourhood until fixpoint
    init = jnp.where(vvalid, jnp.arange(capacity, dtype=jnp.int32), capacity)

    def sweep(labels, _):
        gathered = labels[nbr_idx]  # [27, V]
        gathered = jnp.where(nbr_hit, gathered, capacity)
        new = jnp.minimum(labels, gathered.min(axis=0))
        # pointer jumping: a label is itself a voxel index, so hop to that
        # voxel's label — turns O(diameter) convergence into O(log diameter)
        hop = new[jnp.minimum(new, capacity - 1)]
        new = jnp.minimum(new, jnp.where(new < capacity, hop, capacity))
        return new, None

    labels, _ = jax.lax.scan(sweep, init, None, length=iterations)

    # cluster sizes weighted by point counts; pick the biggest
    sizes = jax.ops.segment_sum(counts, labels, num_segments=capacity + 1)
    best = jnp.argmin(jnp.where(jnp.arange(capacity + 1) < capacity,
                                -sizes, jnp.inf))

    # map each point to its voxel's label (via its key)
    vidx, vhit = _lookup(ukey, key)
    pt_label = jnp.where(vhit, labels[vidx], capacity)
    return pt_label == best
