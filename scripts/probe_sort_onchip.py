#!/usr/bin/env python3
"""On-chip validation + timing of the Pallas bitonic argsort.

Runs the COMPILED kernel (first Mosaic exposure — interpret-mode CPU
oracles cannot see lowering failures) against the XLA stable sort at the
pipeline's real shapes, checks exact equality, and times both inside jit.
Decides whether sparse/sorting.py wiring becomes the default.

Run ALONE on the TPU.  Env: PROBE_ITERS.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import mrcc_tpu
    from mrcc_tpu.ops.sort_pallas import bitonic_argsort, supported
    from mrcc_tpu.sparse.types import KEY_PAD

    mrcc_tpu.enable_compilation_cache()
    iters = int(os.environ.get("PROBE_ITERS", 20))
    rng = np.random.default_rng(11)

    shapes = [
        (8, 16384, 0.75),    # voxelize headline: B=8, 16k points, 75% valid
        (8, 12288, 1.0),     # hierarchy L0 downsample
        (8, 2816, 1.0),      # deep level
        (2, 131072, 0.75),   # production voxelize
        (2, 73728, 1.0),     # production L0 (72448 rounded to 8-mult)
    ]

    @jax.jit
    def xla_sort(key):
        order = jnp.argsort(key, axis=-1, stable=True).astype(jnp.int32)
        return jnp.take_along_axis(key, order, axis=-1), order

    print(f"devices: {jax.devices()}  iters={iters}", flush=True)
    print(f"{'shape':>18s} {'xla ms':>8s} {'pallas ms':>10s} {'speedup':>8s}")
    for b, n, fill in shapes:
        if not supported(n):
            print(f"({b},{n}) unsupported by kernel"); continue
        # voxel-like keys: heavy duplicates + KEY_PAD tail
        key = rng.integers(0, max(n // 2, 1024),
                           size=(b, n)).astype(np.int32)
        key[:, int(n * fill):] = int(KEY_PAD)
        key = jnp.asarray(key)

        outs = {}
        rows = {}
        for name, fn in (("xla", xla_sort), ("pallas", bitonic_argsort)):
            try:
                sk, o = fn(key)
                jax.device_get(sk[:, :8])
                t0 = time.perf_counter()
                for _ in range(iters):
                    sk, o = fn(key)
                jax.device_get(sk[:, :8])
                rows[name] = (time.perf_counter() - t0) / iters * 1e3
                outs[name] = (np.asarray(sk), np.asarray(o))
            except Exception as e:  # noqa: BLE001
                print(f"({b:2d},{n:6d}) {name} FAILED: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)
        if len(outs) == 2:
            np.testing.assert_array_equal(outs["xla"][0], outs["pallas"][0])
            np.testing.assert_array_equal(outs["xla"][1], outs["pallas"][1])
            print(f"({b:2d},{n:6d}) {rows['xla']:8.2f} "
                  f"{rows['pallas']:10.2f} "
                  f"{rows['xla'] / rows['pallas']:7.2f}x  (exact match)",
                  flush=True)


if __name__ == "__main__":
    main()
