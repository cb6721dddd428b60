"""Capture a jax.profiler trace of the engine pipeline (SURVEY §5).

Produces a TensorBoard-loadable trace directory with each pipeline stage
wrapped in a TraceAnnotation, so perf work has an artifact instead of
wall-clocks.

  python scripts/profile_trace.py [--out exp/traces] [--batch 8]

Note: on remote-tunneled backends the device-side trace may be empty (the
profiler can only see the local process); the host-side timeline and
stage annotations still record dispatch structure.  Falls back to a
stage-timing JSON when profiler start fails.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="exp/traces")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    from bench import build_inputs, measure_seg_caps
    from mrcc_tpu.app import InferenceConfig, InferenceEngine

    pts, rgb, mask = build_inputs(args.batch, args.points)
    seg_caps = measure_seg_caps(pts, rgb, mask)
    cfg = InferenceConfig(
        point_capacity=args.points, seg_voxel_capacity=seg_caps[0],
        seg_hierarchy_caps=seg_caps[1:], ee_point_capacity=2048,
        ee_voxel_capacity=2048, kp_voxel_capacity=1024,
        ee_hierarchy_caps=(1024, 384, 128, 128),
        kp_hierarchy_caps=(768, 640, 384, 128),
        icp_iterations=15, icp_template_points=1024)
    engine = InferenceEngine(cfg, seed=0)

    # warmup/compile outside the trace
    out = engine.predict_batch_arrays(pts, rgb, mask)
    jax.device_get(out["ee_pose"])

    os.makedirs(args.out, exist_ok=True)
    timings = {}
    try:
        jax.profiler.start_trace(args.out)
        traced = True
    except Exception as e:  # noqa: BLE001
        print(f"profiler unavailable ({e}); recording stage timings only")
        traced = False

    for it in range(args.iters):
        with jax.profiler.TraceAnnotation(f"pipeline_iter{it}"):
            t0 = time.perf_counter()
            with jax.profiler.TraceAnnotation("seg_stage"):
                seg = engine._seg_jit(engine.params["segmentation"], pts,
                                      rgb, mask)
                jax.device_get(seg[1])
            timings.setdefault("seg_ms", []).append(
                (time.perf_counter() - t0) * 1e3)
            _, _, ee_pts, ee_rgb, ee_valid, _ = seg

            t0 = time.perf_counter()
            with jax.profiler.TraceAnnotation("pose_stage"):
                pose, conf = engine._pose_jit(engine.params["rotation"],
                                              ee_pts, ee_rgb, ee_valid)
                jax.device_get(conf)
            timings.setdefault("pose_ms", []).append(
                (time.perf_counter() - t0) * 1e3)

            t0 = time.perf_counter()
            with jax.profiler.TraceAnnotation("kp_stage"):
                kp = engine._kp_jit(engine.params["key_points"], ee_pts,
                                    ee_rgb, ee_valid)
                jax.device_get(kp[1])
            timings.setdefault("kp_ms", []).append(
                (time.perf_counter() - t0) * 1e3)

            t0 = time.perf_counter()
            with jax.profiler.TraceAnnotation("icp_stage"):
                icp = engine._icp_jit(engine.template, ee_pts, ee_valid,
                                      pose, kp[0])
                jax.device_get(icp[0])
            timings.setdefault("icp_ms", []).append(
                (time.perf_counter() - t0) * 1e3)

    if traced:
        jax.profiler.stop_trace()
        print(f"trace written to {args.out}")
    with open(os.path.join(args.out, "stage_timings.json"), "w") as f:
        json.dump(timings, f, indent=2)
    print(json.dumps({k: round(sum(v) / len(v), 2)
                      for k, v in timings.items()}))


if __name__ == "__main__":
    main()
