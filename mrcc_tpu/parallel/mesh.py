"""Device-mesh utilities: data-parallel training/inference over ICI.

The reference has NO distributed machinery (verified in SURVEY.md §2.1 —
single-GPU SLURM jobs with CPU DataLoader workers).  This module is the new
first-class component the TPU build adds: a thin ``jax.sharding`` layer so
every trainer/eval harness runs 1-chip or n-chip unchanged.

Strategy: batch data parallelism.  The padded batch axis is sharded across
the ``data`` mesh axis; parameters are replicated.  XLA inserts the psum for
gradient averaging from the sharding annotations (no hand-written
collectives — scaling-book style: pick a mesh, annotate, let XLA place
collectives on ICI).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first n devices.

    Raises if fewer than ``n_devices`` are available — silently truncating
    would make multi-chip tests "pass" on a single device while proving
    nothing about the sharded path.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"make_mesh({n_devices}): only {len(devices)} devices "
                f"available ({[d.platform for d in devices[:4]]}...). For a "
                "virtual mesh, force JAX_PLATFORMS=cpu and "
                "jax_num_cpu_devices before backend init.")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of [B, ...] arrays with the batch axis sharded.

    B must be divisible by the mesh size (pad the batch if needed).
    """
    sharding = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. params/opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_batch_to(batch, total: int):
    """Pad the leading axis of every array in the batch dict to ``total``
    rows so it divides the mesh size.

    Pads by duplicating item 0 WHOLE (points, mask, labels, pose together):
    each padded row is then a real (item, target) pair, so pose losses and
    metrics that average over the batch axis stay valid — the objective is
    merely reweighted slightly toward item 0 on the final partial batch.
    (Zeroing the mask instead would feed empty clouds with real pose targets
    into unmasked per-item pose losses — garbage gradients.)"""
    def pad(x):
        x = np.asarray(x)
        b = x.shape[0]
        if b == total:
            return x
        return np.concatenate([x, np.repeat(x[:1], total - b, axis=0)],
                              axis=0)

    return {k: (v if k == "others" else pad(v)) for k, v in batch.items()}
