#!/usr/bin/env python3
"""Train demo checkpoints on the synthetic sample set and benchmark them.

Produces exp/{segmentation,rotation,key_points}/ checkpoints with the
reference's naming/retention, wires them into an InferenceEngine, and runs
the full-pipeline BenchmarkApp — the self-contained version of the
reference's train -> app/test.py workflow.

Usage: python scripts/train_demo_checkpoints.py [--epochs 40] [--samples 24]
"""

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--samples", type=int, default=24)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="exp")
    ap.add_argument("--backbone", default="minkunet14A",
                    help="backbone for the demo nets (14A trains fast; "
                         "use 'minkunet' for the flagship 18D)")
    ap.add_argument("--bench-samples", type=int, default=15)
    ap.add_argument("--ee-mult", type=int, default=6,
                    help="EE-crop sample multiplier (rotation regression "
                         "needs far more pose coverage than segmentation; "
                         "round-1 scaling analysis: ~2000 crops needed)")
    ap.add_argument("--pose-epochs", type=int, default=None,
                    help="epochs for the rotation/keypoint heads "
                         "(default: --epochs)")
    ap.add_argument("--kp-epochs", type=int, default=None,
                    help="keypoint-head epochs (default: --pose-epochs; "
                         "lets a rotation-extension run leave the trained "
                         "kp checkpoint untouched)")
    ap.add_argument("--rot-6d", action="store_true",
                    help="train the continuous 6D rotation head "
                         "(LossType.COS2_6D) instead of quaternions")
    ap.add_argument("--confidence", action="store_true",
                    help="train the cos2 confidence heads so the engine's "
                         "is_confident gate runs trained weights")
    ap.add_argument("--pose-batch", type=int, default=None,
                    help="batch size for the rotation/keypoint heads "
                         "(default: --batch; large corpora want 32-64)")
    ap.add_argument("--kp-batch", type=int, default=None,
                    help="keypoint-head batch (default: min(pose batch, "
                         "32) — kp trains at 4096-voxel crops, 2x the "
                         "rotation capacity; batch 64 OOMs 16G HBM)")
    ap.add_argument("--mesh", type=int, default=None,
                    help="data-parallel mesh size for training (any "
                         "device kind; CPU needs "
                         "xla_force_host_platform_device_count)")
    ap.add_argument("--pose-lr", type=float, default=1e-3,
                    help="rotation/keypoint lr (large --pose-batch runs "
                         "need it lowered)")
    ap.add_argument("--conv-impl", default="auto",
                    help="engine conv impl for the held-out benchmark "
                         "(auto|pallas|pallas-int8|xla) — int8 vs bf16 "
                         "accuracy-delta runs restore the same checkpoints")
    ap.add_argument("--train-conv-impl", default="auto",
                    help="sparse-conv impl for the TRAIN steps "
                         "(auto|pallas|xla; auto = Pallas custom-VJP "
                         "kernels on TPU — scripts/probe_train_impl.py "
                         "measures the two)")
    ap.add_argument("--skip-bench", action="store_true",
                    help="train only, skip the engine build + held-out "
                         "benchmark (chunked-training invocations: the "
                         "tunneled runtime leaks ~11 MB of host RSS per "
                         "dispatched train step, so long corpora train "
                         "in resume chunks across processes)")
    ap.add_argument("--bench-only", action="store_true",
                    help="skip sample generation/training: restore all "
                         "three checkpoints at their saved epochs and run "
                         "only the held-out benchmark (requires a prior "
                         "full run whose final epochs were checkpointed)")
    ap.add_argument("--flip-disambiguation", action="store_true",
                    help="enable the keypoint-guided gripper-symmetry "
                         "flip stage (solve/symmetry.py, ROADMAP r5 #2)")
    ap.add_argument("--symmetry-loss", action="store_true",
                    help="symmetry-aware rotation loss: the 6D/cos2 "
                         "rotation term takes the better 180-about-z "
                         "branch (train-time twin of the flip stage)")
    ap.add_argument("--no-k3-self-keyed", action="store_true",
                    help="disable self-keyed k3 convs in the benchmark "
                         "engine (r5 default is ON)")
    ap.add_argument("--z-percentile", type=float, default=None,
                    help="percentile-z translation instead of the "
                         "reference's hard min-z (ROADMAP r5 #3)")
    ap.add_argument("--json-out", default=None,
                    help="write the held-out benchmark stats table "
                         "(Avg/Min/Max/Med/Std/N per metric) to this path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import mrcc_tpu
    from mrcc_tpu.data import AliveV2Dataset, DataConfig
    from mrcc_tpu.data.synthetic import generate_sample, gt_base2cam_pose
    from mrcc_tpu.models import RobotNetEncode, RobotNetSegmentation
    from mrcc_tpu.train import (LossConfig, LossType, TrainConfig, Trainer,
                                make_pose_train_step,
                                make_segmentation_train_step)
    from mrcc_tpu.train import checkpoint as ckpt

    mrcc_tpu.enable_compilation_cache()
    print(f"devices: {jax.devices()}", flush=True)
    mesh = None
    if args.mesh:
        from mrcc_tpu.parallel import make_mesh

        mesh = make_mesh(args.mesh)
    n_scenes = 1 if args.bench_only else args.samples
    samples = [generate_sample(seed=1000 + i, n_ee=2048, n_arm=3000,
                               n_bg=7000) for i in range(n_scenes)]
    # pose/keypoint heads see only the EE crop — generate many cheap
    # EE-dominant samples for pose diversity (rotation regression needs far
    # more pose coverage than segmentation does)
    n_crops = 1 if args.bench_only else args.samples * args.ee_mult
    ee_samples = [generate_sample(seed=20000 + i, n_ee=2048, n_arm=96,
                                  n_bg=96)
                  for i in range(n_crops)]
    tc = TrainConfig(lr=1e-3, batch_size=args.batch, epochs=args.epochs,
                     save_freq=max(args.epochs // 2, 1),
                     conv_impl=args.train_conv_impl)

    # ---------------- segmentation (full scenes, 3 classes)
    t0 = time.time()
    seg_cfg = DataConfig(data_type=None, max_points=16384, scale=200,
                         center_at_origin=True)
    seg_ds = AliveV2Dataset(samples=samples, cfg=seg_cfg)
    seg_model = RobotNetSegmentation(backbone=args.backbone, in_channels=3,
                                     num_classes=3)
    step, opt = make_segmentation_train_step(seg_model, seg_cfg, tc,
                                             voxel_capacity=8192)
    trainer = Trainer(seg_model, seg_ds, step, opt, tc, mesh=mesh,
                      exp_path=f"{args.out}/segmentation", exp_name="seg")
    hist = (None if args.bench_only else
            trainer.fit(epochs=args.epochs))
    if hist:
        print(f"seg: loss {hist[0]['loss']:.3f} -> {hist[-1]['loss']:.3f} "
              f"({time.time()-t0:.0f}s)", flush=True)
    else:
        print(f"seg: restored from checkpoint", flush=True)
    seg_state = trainer.state

    # ---------------- rotation (EE crops, 7-DoF, cos2)
    t0 = time.time()
    rot_cfg = DataConfig(data_type="ee_seg", max_points=4096, scale=200,
                         center_at_origin=True)
    rot_ds = AliveV2Dataset(samples=ee_samples, cfg=rot_cfg)
    rot_pose_w = 9 if args.rot_6d else 7
    rot_model = RobotNetEncode(
        backbone=args.backbone, in_channels=3,
        out_channels=rot_pose_w + (3 if args.confidence else 0),
        rot_dims=6 if args.rot_6d else 4)
    rtc = TrainConfig(lr=args.pose_lr,
                      batch_size=args.pose_batch or args.batch,
                      epochs=args.epochs,
                      save_freq=max(args.epochs // 2, 1),
                      conv_impl=args.train_conv_impl)
    rstep, ropt = make_pose_train_step(
        rot_model, rot_cfg,
        LossConfig(loss_type=(LossType.COS2_6D if args.rot_6d
                              else LossType.COS2),
                   compute_confidence=args.confidence,
                   symmetry_flip_axis=("z" if args.symmetry_loss
                                       else None)), rtc,
        voxel_capacity=2048)
    rtrainer = Trainer(rot_model, rot_ds, rstep, ropt, rtc, mesh=mesh,
                       exp_path=f"{args.out}/rotation", exp_name="rot")
    rhist = (None if args.bench_only else
             rtrainer.fit(epochs=args.pose_epochs or args.epochs))
    if rhist:
        print(f"rot: loss {rhist[0]['loss']:.3f} -> {rhist[-1]['loss']:.3f} "
              f"({time.time()-t0:.0f}s)", flush=True)
    else:
        print(f"rot: restored from checkpoint", flush=True)
    rot_state = rtrainer.state

    # ---------------- keypoints (EE crops, 6 classes, sparse path, scale 800)
    t0 = time.time()
    kp_cfg = DataConfig(data_type="ee_seg", max_points=4096, scale=800,
                        center_at_origin=True, keypoints_enabled=True,
                        num_of_keypoints=6)
    kp_ds = AliveV2Dataset(samples=ee_samples, cfg=kp_cfg)
    kp_model = RobotNetSegmentation(backbone=args.backbone, in_channels=3,
                                    num_classes=6)
    ktc = dataclasses.replace(
        rtc, batch_size=(args.kp_batch
                         or min(args.pose_batch or args.batch, 32)))
    kstep, kopt = make_segmentation_train_step(kp_model, kp_cfg, ktc,
                                               voxel_capacity=4096)
    ktrainer = Trainer(kp_model, kp_ds, kstep, kopt, ktc, mesh=mesh,
                       exp_path=f"{args.out}/key_points", exp_name="kp")
    kp_epochs = (args.kp_epochs if args.kp_epochs is not None
                 else (args.pose_epochs or args.epochs))
    khist = (None if args.bench_only or kp_epochs == 0 else
             ktrainer.fit(epochs=kp_epochs))
    if khist:
        print(f"kp: loss {khist[0]['loss']:.3f} -> {khist[-1]['loss']:.3f} "
              f"({time.time()-t0:.0f}s)", flush=True)
    else:
        print(f"kp: restored from checkpoint", flush=True)
    kp_state = ktrainer.state

    if args.skip_bench:
        print("skip-bench: training chunk done", flush=True)
        return

    # ---------------- wire into the engine + benchmark
    from mrcc_tpu.app import InferenceConfig, InferenceEngine, SyntheticDataEngine
    from mrcc_tpu.eval.benchmark import BenchmarkApp

    # honest capacities (occupancy-measured for 16k-pt synthetic scenes;
    # saturated buffers silently drop voxels)
    icfg = InferenceConfig(
        point_capacity=16384, seg_voxel_capacity=12288,
        seg_hierarchy_caps=(9856, 6400, 2816, 896),
        ee_point_capacity=4096,
        ee_voxel_capacity=2048, kp_voxel_capacity=4096,
        seg_backbone=args.backbone, rot_backbone=args.backbone,
        kp_backbone=args.backbone, icp_iterations=15, icp_template_points=1024,
        kp_conf_threshold=0.5, conv_impl=args.conv_impl,
        rot_6d=args.rot_6d, compute_confidence=args.confidence,
        rot_flip_disambiguation=args.flip_disambiguation,
        translation_z_percentile=args.z_percentile,
        k3_self_keyed=not args.no_k3_self_keyed,
        # synthetic EE crops carry ~2048 points; the reference's 2048-point
        # confidence gate would reject everything at ~90% seg recall
        sanity_min_num_of_ee_points=1024)
    params = {
        "segmentation": {"params": seg_state.params,
                         "batch_stats": seg_state.batch_stats},
        "rotation": {"params": rot_state.params,
                     "batch_stats": rot_state.batch_stats},
        "key_points": {"params": kp_state.params,
                       "batch_stats": kp_state.batch_stats},
    }
    engine = InferenceEngine(icfg, params=params)
    source = SyntheticDataEngine(seed=5000, n_ee=2048, n_arm=3000, n_bg=7000)
    if engine._conv_impl == "pallas-int8":
        # static activation scales, calibrated on one representative scene
        # (the accuracy benchmark then measures the production int8 path)
        cal = source.get()
        cp, cr, cm, _, _ = engine._pad(cal.points, cal.rgb)
        engine.calibrate_q8(cp, cr, cm)
    app = BenchmarkApp(engine, source, gt_base2cam_pose(),
                       n_samples=args.bench_samples, ignore_unconfident=False)
    res = app.run(out_path=f"{args.out}/trained_benchmark.xlsx")
    print(json.dumps({k: round(float(np.mean(v)), 4)
                      for k, v in res["metrics"].items() if v}, indent=2),
          flush=True)
    print("calibration:", res["calibration"], flush=True)

    if args.json_out:
        table = {}
        for k, v in res["metrics"].items():
            if not v:
                continue
            a = np.asarray(v, np.float64)
            table[k] = {"Avg": float(a.mean()), "Min": float(a.min()),
                        "Max": float(a.max()), "Med": float(np.median(a)),
                        "Std": float(a.std()), "N": int(a.size)}
        out = {"table": table,
               "calibration": ({k: float(v)
                                for k, v in res["calibration"].items()}
                               if res["calibration"] else None),
               "config": {"samples": args.samples, "epochs": args.epochs,
                          "conv_impl": args.conv_impl,
                          "ee_mult": args.ee_mult,
                          "pose_epochs": args.pose_epochs or args.epochs,
                          "pose_batch": args.pose_batch or args.batch,
                          "backbone": args.backbone,
                          "rot_6d": args.rot_6d,
                          "confidence": args.confidence,
                          "k3_self_keyed": not args.no_k3_self_keyed,
                          "rot_flip_disambiguation":
                              args.flip_disambiguation,
                          "translation_z_percentile": args.z_percentile,
                          "symmetry_loss": args.symmetry_loss}}
        Path(args.json_out).parent.mkdir(parents=True, exist_ok=True)
        with open(args.json_out, "w") as fp:
            json.dump(out, fp, indent=2)
        print(f"wrote {args.json_out}", flush=True)


if __name__ == "__main__":
    main()
