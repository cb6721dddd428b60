#!/usr/bin/env python3
"""Seg-backbone study (VERDICT r3 -> r4 item #2: attack the decoder at the
model level).

The engine's flagship backbone is MinkUNet18D, whose 384-wide decoder is
~76% of U-Net time and is bound by the column-tile law (RESULTS.md).  The
reference's own default PLANES is (32,64,128,256,256,128,96,96)
(/root/reference/model/backbone/minkunet.py:40-44) — an untested accuracy
choice vs 18D's 384-everywhere (:238-239).  This study trains each
candidate backbone on the SAME synthetic corpus, evaluates held-out
segmentation metrics, and reports train-step cost; pipeline throughput per
backbone comes from `BENCH_SEG_BACKBONE=<name> python bench.py`.

Run on the TPU.  Env: SEG_BACKBONES (csv), SEG_SAMPLES, SEG_EPOCHS,
SEG_BATCH, SEG_HELDOUT, SEG_OUT (exp dir), SEG_JSON (results path).
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax

    import mrcc_tpu
    from mrcc_tpu.data import AliveV2Dataset, DataConfig
    from mrcc_tpu.data.synthetic import generate_sample
    from mrcc_tpu.eval.harness import evaluate_segmentation
    from mrcc_tpu.models import RobotNetSegmentation
    from mrcc_tpu.train import (TrainConfig, Trainer,
                                make_segmentation_train_step)

    mrcc_tpu.enable_compilation_cache()
    backbones = os.environ.get(
        "SEG_BACKBONES", "minkunet,minkunet18,minkunet14A").split(",")
    n_train = int(os.environ.get("SEG_SAMPLES", 32))
    n_held = int(os.environ.get("SEG_HELDOUT", 20))
    epochs = int(os.environ.get("SEG_EPOCHS", 40))
    batch = int(os.environ.get("SEG_BATCH", 8))
    out_dir = os.environ.get("SEG_OUT", "exp_r4")
    json_out = os.environ.get("SEG_JSON", "results/seg_backbone_study.json")

    print(f"devices: {jax.devices()}", flush=True)
    train_samples = [generate_sample(seed=1000 + i, n_ee=2048, n_arm=3000,
                                     n_bg=7000) for i in range(n_train)]
    # held-out seeds match the trained benchmark's SyntheticDataEngine
    # (seed=5000 + i) so accuracy numbers are comparable across studies
    held_samples = [generate_sample(seed=5000 + i, n_ee=2048, n_arm=3000,
                                    n_bg=7000) for i in range(n_held)]
    cfg = DataConfig(data_type=None, max_points=16384, scale=200,
                     center_at_origin=True)
    train_ds = AliveV2Dataset(samples=train_samples, cfg=cfg)
    held_ds = AliveV2Dataset(samples=held_samples, cfg=cfg)

    rows = {}
    for backbone in backbones:
        # the wide 18-layer nets (384/256-ch decoders) exceed HBM in the
        # backward without rematerialized blocks — remat is the flagship
        # training configuration on one chip
        remat = backbone in ("minkunet", "minkunet18", "minkunet18d")
        model = RobotNetSegmentation(backbone=backbone, in_channels=3,
                                     num_classes=3, remat=remat)
        row = {"backbone": backbone, "epochs": epochs, "remat": remat}
        for bsz in (batch, batch // 2, batch // 4):
            tc = TrainConfig(lr=1e-3, batch_size=bsz, epochs=epochs,
                             save_freq=max(epochs // 2, 1), conv_impl="auto")
            step, opt = make_segmentation_train_step(model, cfg, tc,
                                                     voxel_capacity=8192)
            trainer = Trainer(model, train_ds, step, opt, tc,
                              exp_path=f"{out_dir}/seg_{backbone}",
                              exp_name="seg")
            try:
                t0 = time.time()
                hist = trainer.fit(epochs=epochs)
                row["batch"] = bsz
                row["train_s"] = round(time.time() - t0, 1)
                if hist:
                    row["loss_first"] = round(hist[0]["loss"], 4)
                    row["loss_last"] = round(hist[-1]["loss"], 4)
                    row["iter_time_s"] = round(hist[-1]["iter_time"], 3)
                break
            except Exception as e:  # noqa: BLE001 — OOM -> halve the batch
                msg = str(e).splitlines()[0][:120]
                if bsz == batch // 4:
                    row["error"] = msg
                    print(f"{backbone} B={bsz} failed ({msg}); giving up",
                          flush=True)
                else:
                    print(f"{backbone} B={bsz} failed ({msg}); retrying at "
                          f"B={bsz // 2}", flush=True)
        if "error" in row:
            rows[backbone] = row
            continue

        variables = {"params": trainer.state.params,
                     "batch_stats": trainer.state.batch_stats}
        res = evaluate_segmentation(model, variables, held_ds,
                                    voxel_capacity=12288, batch_size=4)
        row["heldout"] = {k: round(res["overall"][k]["avg"], 4)
                          for k in ("accuracy", "precision", "recall")}
        row["heldout_ee"] = {
            k: round(float(np.mean([r["class_results"]["ee"][k]
                                    for r in res["instances"]])), 4)
            for k in ("precision", "recall")}
        rows[backbone] = row
        print(json.dumps(row), flush=True)

    Path(json_out).parent.mkdir(parents=True, exist_ok=True)
    with open(json_out, "w") as fp:
        json.dump(rows, fp, indent=2)
    print(f"wrote {json_out}", flush=True)


if __name__ == "__main__":
    main()
