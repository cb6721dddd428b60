"""Jit helpers for setup paths.

On remote-compiled TPU backends, EAGER op dispatch is catastrophically slow
(every small op round-trips a compile), so anything that touches arrays
during setup — parameter init, hierarchy building for shape discovery — must
run under jit.  (Measured on this environment: eager MinkUNet14A ``init``
128 s vs 19 s compile + 0.05 s run when jitted.)
"""

from __future__ import annotations

import jax


def jit_init(model, rngs, *args, **kwargs):
    """``model.init`` under jit (flax init is pure, so this is safe)."""
    fn = jax.jit(lambda r, *a: model.init(r, *a, **kwargs))
    return fn(rngs, *args)
