"""Trace-time implementation selector shared by the sparse ops.

  "xla"    — searchsorted/gather formulations (differentiable; training).
  "pallas" — ops/conv_pallas.py + ops/rank_pallas.py windowed kernels
             (forward-only; the inference engine's TPU path).

The flag is consulted while TRACING (jit caches the traced graph), so
holders wrap stage functions in the context manager before jitting.
"""

from __future__ import annotations

import contextlib

_IMPL = "xla"


def current() -> str:
    return _IMPL


@contextlib.contextmanager
def sparse_impl(name: str):
    global _IMPL
    assert name in ("xla", "pallas"), name
    old, _IMPL = _IMPL, name
    try:
        yield
    finally:
        _IMPL = old
