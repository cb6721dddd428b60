"""Worker process for the 2-process DCN fleet test (tests/test_multichip.py).

Each process owns 2 virtual CPU devices (4 global), joins the cluster via
``fleet.init_distributed``, builds the SAME small engine (seed=0 params are
deterministic per process), globalizes its local 4-row batch slice into the
8-row global batch, predicts, and writes its local slice of the outputs to
an .npz the parent asserts against a single-process oracle.

Pins the multi-host contract of mrcc_tpu/parallel/fleet.py
(init_distributed / make_global_mesh / globalize / local_slice) that the
degenerate single-process tests cannot see (SURVEY.md §5 "multi-host
inference over DCN").  Env set by the parent test: JAX_COORDINATOR_ADDRESS,
JAX_NUM_PROCESSES, JAX_PROCESS_ID, FLEET_OUT.
"""

import os
import sys

# 2 local virtual CPU devices per process, BEFORE any jax import (drop any
# inherited device-count flag — the parent test process runs with 8)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "xla_force_host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    _flags + ["--xla_force_host_platform_device_count=2"])
# CPU-only compile cache (see tests/conftest.py: foreign AOT SIGILL risk)
os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.expanduser(
    "~/.cache/mrcc_jax_cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax  # noqa: E402

    # env vars alone do NOT stick — the axon TPU plugin re-registers; the
    # config update before first backend use is what forces CPU here
    # (same dance as tests/conftest.py / verify-skill "environment gotcha")
    jax.config.update("jax_platforms", "cpu")

    import mrcc_tpu  # noqa: E402
    from mrcc_tpu.parallel import fleet  # noqa: E402

    mrcc_tpu.enable_compilation_cache()
    assert fleet.init_distributed() is True
    rank = jax.process_index()
    nproc = jax.process_count()
    assert nproc == 2, nproc

    mesh = fleet.make_global_mesh()
    assert mesh.devices.size == 4, mesh.devices

    # Establish the cross-process (gloo) collective context NOW, while the
    # workers are seconds apart: on a 1-core box the heavy engine compiles
    # serialize across processes, and gloo context init has a 30 s
    # deadline — entering the first collective minutes apart kills the
    # run.  A tiny replicated-sum of a globalized array forces the
    # rendezvous cheaply; the heavy program then reuses the warm channels.
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    warm = fleet.globalize(mesh, np.full((2, 1), 1.0 + rank, np.float32))[0]
    total = jax.jit(jnp.sum,
                    out_shardings=NamedSharding(mesh, PartitionSpec()))(warm)
    assert float(total) == 6.0, float(total)  # 2 rows of 1.0 + 2 of 2.0

    if os.environ.get("FLEET_MODE") == "train":
        _train_mode(mesh, rank)
        return

    from test_multichip import build_batch, small_cfg  # noqa: E402

    from mrcc_tpu.app import InferenceEngine  # noqa: E402

    pts, rgb, mask = build_batch(b=8, p=1024)
    lo, hi = rank * 4, rank * 4 + 4
    gpts, grgb, gmask = fleet.globalize(mesh, pts[lo:hi], rgb[lo:hi],
                                        mask[lo:hi])
    assert gpts.shape == (8, 1024, 3), gpts.shape

    engine = InferenceEngine(small_cfg(), seed=0, mesh=mesh)
    out = engine.predict_batch_arrays(gpts, grgb, gmask)

    np.savez(os.environ["FLEET_OUT"],
             rank=rank,
             segmentation=fleet.local_slice(out["segmentation"]),
             ee_count=fleet.local_slice(out["ee_count"]),
             ee_pose=fleet.local_slice(out["ee_pose"]),
             kp_found=fleet.local_slice(out["kp_found"]))
    print(f"fleet worker {rank}: ok", flush=True)


def _train_mode(mesh, rank):
    """Data-parallel TRAINING across the 2-process fleet (VERDICT r4 #6):
    each process feeds its local half of the global batch; the sharded
    train step's psum-averaged gradients must leave every process with
    identical (replicated) parameters, matching a single-process run of
    the same global batch (asserted by the parent)."""
    import jax
    import jax.numpy as jnp

    from test_multichip import fleet_train_setup  # noqa: E402

    from mrcc_tpu.parallel import fleet  # noqa: E402

    step, state0, batch_np, n_steps = fleet_train_setup()
    lo, hi = rank * 4, rank * 4 + 4
    local = {k: v[lo:hi] for k, v in batch_np.items()}
    keys = sorted(local)
    gvals = fleet.globalize(mesh, *[local[k] for k in keys])
    gbatch = dict(zip(keys, gvals))

    state = state0
    losses = []
    for _ in range(n_steps):
        state, metrics = jax.jit(step)(state, gbatch, 1e-3)
        losses.append(float(metrics["loss"]))
    pnorm = float(jnp.sqrt(sum(
        jnp.sum(x.astype(jnp.float32) ** 2)
        for x in jax.tree_util.tree_leaves(state.params))))
    np.savez(os.environ["FLEET_OUT"], rank=rank,
             losses=np.asarray(losses, np.float64),
             param_norm=np.float64(pnorm))
    print(f"fleet train worker {rank}: ok losses={losses}", flush=True)


if __name__ == "__main__":
    main()
