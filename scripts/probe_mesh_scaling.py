"""Multi-chip scaling evidence table (VERDICT r4 #6).

Runs the FLAGSHIP (18D) sharded train step on virtual CPU meshes of
n = 1/2/4/8 devices with the SAME global batch, and reports per n:

  - per-device batch rows,
  - step parity vs the n=1 oracle (loss + grad-updated param drift),
  - the collective traffic XLA inserted (all-reduce ops and bytes,
    parsed from the compiled HLO) — the sharding-annotation story of
    parallel/mesh.py made measurable.

Writes results/mesh_scaling_r5.json and prints the table.  CPU-only
(xla_force_host_platform_device_count); wall-clock on a 1-core box is
compile-dominated, so no timing claims are made here — this is a
correctness + collective-placement artifact.

Usage: python scripts/probe_mesh_scaling.py [--out results/mesh_scaling_r5.json]
"""

import argparse
import json
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "xla_force_host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    _flags + ["--xla_force_host_platform_device_count=8"])
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/mrcc_jax_cpu"))

import numpy as np  # noqa: E402


_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s8": 1, "u8": 1, "pred": 1, "f64": 8, "s64": 8}


def collective_stats(hlo_text):
    """(op_count, total_bytes) over all-reduce / reduce-scatter /
    all-gather ops in a compiled HLO dump."""
    n_ops = 0
    total = 0
    # e.g. "%all-reduce.1 = (f32[2,64]{...}, ...) all-reduce("
    for m in re.finditer(
            r"= \(?([a-z0-9]+\[[^)]*?)\)? (all-reduce|reduce-scatter|"
            r"all-gather)\(", hlo_text):
        n_ops += 1
        for tm in re.finditer(r"([a-z0-9]+)\[([0-9,]*)\]", m.group(1)):
            dt, dims = tm.group(1), tm.group(2)
            size = 1
            for d in dims.split(","):
                if d:
                    size *= int(d)
            total += size * _DTYPE_BYTES.get(dt, 4)
    return n_ops, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/mesh_scaling_r5.json")
    ap.add_argument("--backbone", default="minkunet",
                    help="flagship 18D by default")
    ap.add_argument("--global-batch", type=int, default=8)
    ap.add_argument("--ns", default="1,2,4,8",
                    help="mesh sizes to run (rows APPEND to --out if it "
                         "exists — the XLA-CPU collective rendezvous has "
                         "a 40 s termination timeout that a loaded 1-core "
                         "box can trip, so runs are resumable per n)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    import mrcc_tpu
    from mrcc_tpu.data import AliveV2Dataset, DataConfig
    from mrcc_tpu.data.synthetic import generate_sample
    from mrcc_tpu.models import RobotNetSegmentation
    from mrcc_tpu.parallel import make_mesh
    from mrcc_tpu.parallel import mesh as mesh_lib
    from mrcc_tpu.train import TrainConfig, make_segmentation_train_step
    from mrcc_tpu.train.trainer import TrainState

    mrcc_tpu.enable_compilation_cache()
    assert len(jax.devices()) >= 8, jax.devices()

    cfg = DataConfig(data_type=None, max_points=2048, scale=200,
                     center_at_origin=True)
    samples = [generate_sample(seed=500 + i, n_ee=256, n_arm=512, n_bg=1024)
               for i in range(args.global_batch)]
    ds = AliveV2Dataset(samples=samples, cfg=cfg)
    batch = ds.collate([ds[i] for i in range(args.global_batch)])
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if hasattr(v, "shape")}

    model = RobotNetSegmentation(backbone=args.backbone, in_channels=3,
                                 num_classes=3)
    tc = TrainConfig(lr=1e-3, batch_size=args.global_batch, epochs=1)
    step, opt = make_segmentation_train_step(model, cfg, tc,
                                             voxel_capacity=1024)

    # init once (replicated start state shared by every mesh size)
    from mrcc_tpu.sparse import build_hierarchy, voxelize

    vox, _, _ = voxelize(batch["points"][:1], batch["feats"][:1],
                         batch["mask"][:1], cfg.quantization_size, 512)
    levels = build_hierarchy(vox, 4, capacities=(256, 128, 64, 64))
    variables = model.init(jax.random.PRNGKey(0), vox.feats, levels)
    state0 = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=opt.init(variables["params"]))

    import json as _json
    rows = []
    ref = None
    if os.path.exists(args.out):
        with open(args.out) as fp:
            rows = _json.load(fp).get("rows", [])
        if rows:
            r0 = [r for r in rows if r["n_devices"] == 1]
            if r0:
                ref = (r0[0]["loss"], r0[0]["post_step_param_norm"])
    done = {r["n_devices"] for r in rows}
    for n in tuple(int(x) for x in args.ns.split(",")):
        if n in done:
            continue
        mesh = make_mesh(n)
        sb = mesh_lib.shard_batch(batch, mesh)
        lowered = jax.jit(step).lower(state0, sb, 1e-3)
        compiled = lowered.compile()
        n_coll, coll_bytes = collective_stats(compiled.as_text())
        new_state, metrics = jax.jit(step)(state0, sb, 1e-3)
        loss = float(metrics["loss"])
        pnorm = float(
            jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                         for x in jax.tree_util.tree_leaves(
                             new_state.params))))
        if ref is None:
            ref = (loss, pnorm)
        row = {"n_devices": n,
               "per_device_batch": args.global_batch // n,
               "loss": loss,
               "loss_vs_n1": abs(loss - ref[0]),
               "post_step_param_norm": pnorm,
               "param_norm_vs_n1": abs(pnorm - ref[1]),
               "allreduce_ops": n_coll,
               "collective_bytes": coll_bytes}
        rows.append(row)
        print(row, flush=True)
        # parity gate: data-parallel grad averaging must reproduce the
        # single-device step modulo f32 reduction order
        assert abs(loss - ref[0]) < 1e-4 * max(abs(ref[0]), 1.0), row
        assert abs(pnorm - ref[1]) < 1e-3 * max(ref[1], 1.0), row
        out = {"backbone": args.backbone,
               "global_batch": args.global_batch,
               "voxel_capacity": 1024,
               "rows": sorted(rows, key=lambda r: r["n_devices"]),
               "note": "virtual CPU mesh; parity + collective placement "
                       "evidence, not wall-clock (1-core box)"}
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        with open(args.out, "w") as fp:
            json.dump(out, fp, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
