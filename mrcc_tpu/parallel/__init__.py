"""Device-mesh parallelism utilities (data-parallel over ICI; fleet.py
stretches the same mesh over multi-host DCN)."""

from . import fleet, mesh  # noqa: F401
from .mesh import (  # noqa: F401
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    pad_batch_to,
    replicate,
    shard_batch,
)
