"""Multi-host (DCN) fleet mode: the same data-parallel design, spanning
processes.

The single-host story (mesh.py) shards the batch axis over ICI.  A fleet
run is the same mesh stretched over every host's devices: JAX's runtime
routes the parameter broadcast and any cross-host collectives over DCN
while per-shard compute stays local — there is nothing NCCL/MPI-like to
write (scaling-book recipe: one global mesh, annotate, let XLA place
collectives).

Bring-up protocol (one call per process, before any jax array work):

    from mrcc_tpu.parallel import fleet
    fleet.init_distributed()          # env-driven; no-op single-process
    mesh = fleet.make_global_mesh()   # all devices of all processes
    engine = InferenceEngine(cfg, params=params, mesh=mesh)
    out = engine.predict_batch_arrays(*fleet.globalize(mesh, pts, rgb, mask))

Each process passes its OWN slice of the batch to :func:`globalize`;
the returned global jax.Arrays are addressable only where they live, and
``predict_batch_arrays`` / the Trainer run unchanged.

Environment (standard JAX cluster variables, e.g. set by the launcher):
  JAX_COORDINATOR_ADDRESS  host:port of process 0
  JAX_NUM_PROCESSES        world size
  JAX_PROCESS_ID           this process's rank

Real multi-host DCN hardware is not reachable from this repo's CI — the
degenerate single-process path (init no-op, global mesh == local mesh,
globalize == device_put) is tested in tests/test_multichip.py; the
protocol above is the documented bring-up for a real pod slice.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import DATA_AXIS, batch_sharding

_initialized = False


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Join the JAX cluster (DCN control plane).  Idempotent.

    Arguments fall back to JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID.  Returns True if a multi-process runtime was
    initialized, False for the single-process no-op (no env, no args).
    """
    global _initialized
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid) if pid is not None else None

    if coordinator_address is None or (num_processes or 1) <= 1:
        return False
    if _initialized:
        return True
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return True


def make_global_mesh(devices=None) -> Mesh:
    """1-D data mesh over ALL global devices (every process's chips).

    Device order is jax.devices() global order, so consecutive batch
    shards land on consecutive chips and the data axis crosses hosts only
    at process boundaries (batch shards never straddle DCN)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (DATA_AXIS,))


def globalize(mesh: Mesh, *local_arrays):
    """Assemble per-process batch shards into global batch-sharded arrays.

    Each process passes its LOCAL [b_local, ...] slice; the result is a
    global [b_local * num_processes, ...] jax.Array sharded over the data
    axis.  Single-process: equivalent to device_put with batch sharding.
    """
    sharding = batch_sharding(mesh)
    out = []
    for x in local_arrays:
        x = np.asarray(x)
        if jax.process_count() == 1:
            out.append(jax.device_put(x, sharding))
        else:
            out.append(jax.make_array_from_process_local_data(sharding, x))
    return tuple(out)


def local_slice(global_array):
    """This process's rows of a batch-sharded global output (the mirror of
    :func:`globalize` for results)."""
    shards = [s for s in global_array.addressable_shards]
    if not shards:
        return np.zeros((0,) + global_array.shape[1:], global_array.dtype)
    shards.sort(key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
