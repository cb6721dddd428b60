"""TPU sparse-voxel tensor core.

Replaces MinkowskiEngine for this framework: fixed-capacity padded voxel
buffers, sort-based quantization, precomputed kernel maps and gather->GEMM
sparse convolutions (see SURVEY.md §2.1 for the mapping from ME ops).
"""

from . import conv, hierarchy, nn, quantize, types  # noqa: F401
from .hierarchy import Level, build_hierarchy  # noqa: F401
from .quantize import slice_to_points, voxelize  # noqa: F401
from .types import KEY_PAD, SparseVoxels, pack_key, unpack_key  # noqa: F401
