"""Timing exploration: MXU brute-force NN vs sort-based key lookup.

Counterpart of /root/reference/playground/speedup_shapematch.py (scipy
cKDTree vs brute numpy for shape matching).  On TPU the same tradeoff is
"one big [N, M] distance matmul on the MXU" vs "sort + searchsorted" —
this script times both at growing sizes, which is exactly the evidence
behind solve/icp.py's brute-force-NN design.

  python playground/speedup_shapematch.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


@jax.jit
def nn_bruteforce(src, tgt):
    """argmin_j |src_i - tgt_j| via the |a-b|^2 = |a|^2 - 2ab + |b|^2
    expansion — the cross term is ONE MXU matmul."""
    cross = src @ tgt.T
    d2 = (jnp.sum(src * src, 1)[:, None] - 2 * cross
          + jnp.sum(tgt * tgt, 1)[None, :])
    return jnp.argmin(d2, axis=1)


@jax.jit
def nn_sorted_z(src, tgt):
    """searchsorted on the z coordinate then a +-K local refinement —
    the 'clever' low-FLOP structure (loses on TPU at these sizes)."""
    k = 16
    order = jnp.argsort(tgt[:, 2])
    tz = tgt[order, 2]
    pos = jnp.searchsorted(tz, src[:, 2])
    offs = jnp.arange(-k, k)
    cand = jnp.clip(pos[:, None] + offs[None, :], 0, tgt.shape[0] - 1)
    cpts = tgt[order][cand]                        # [N, 2K, 3]
    d2 = jnp.sum((src[:, None, :] - cpts) ** 2, -1)
    return order[jnp.take_along_axis(cand, jnp.argmin(d2, 1)[:, None],
                                     1)[:, 0]]


def bench(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    print(f"{'N':>7} {'M':>7} {'brute ms':>9} {'sorted ms':>10} "
          f"{'agree %':>8}")
    for n, m in ((1024, 1024), (4096, 2048), (16384, 2048), (65536, 4096)):
        src = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        tgt = jnp.asarray(rng.normal(size=(m, 3)).astype(np.float32))
        tb = bench(nn_bruteforce, src, tgt)
        ts = bench(nn_sorted_z, src, tgt)
        agree = float(np.mean(np.asarray(nn_bruteforce(src, tgt))
                              == np.asarray(nn_sorted_z(src, tgt)))) * 100
        print(f"{n:7d} {m:7d} {tb:9.3f} {ts:10.3f} {agree:8.1f}")


if __name__ == "__main__":
    main()
