"""Trace-time implementation selector shared by the sparse ops.

  "xla"         — searchsorted/gather formulations (differentiable).
  "pallas"      — ops/conv_pallas.py + ops/rank_pallas.py windowed kernels
                  (differentiable via the custom VJP; the TPU path).
  "pallas-int8" — same kernels with int8 quantized gather+GEMM
                  (inference only; 2x MXU rate, half the VMEM tables).

The flag is consulted while TRACING (jit caches the traced graph), so
holders wrap stage functions in the context manager before jitting.
"""

from __future__ import annotations

import contextlib

_IMPL = "xla"
IMPLS = ("xla", "pallas", "pallas-int8")


def current() -> str:
    return _IMPL


@contextlib.contextmanager
def sparse_impl(name: str):
    global _IMPL
    assert name in IMPLS, name
    old, _IMPL = _IMPL, name
    try:
        yield
    finally:
        _IMPL = old
