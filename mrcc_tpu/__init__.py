"""mrcc_tpu — TPU-native markerless robot–camera calibration framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
bcsefercik/markerless-robot-camera-calibration (PyTorch + MinkowskiEngine +
Open3D): 7-DoF end-effector pose estimation from RGB-D point clouds and
camera-to-robot-base extrinsic calibration, with no fiducial markers.

Layer map (see SURVEY.md for the reference layer map this mirrors):

- ``mrcc_tpu.geometry``  — quaternion/SE(3) math, Kabsch, metrics, averaging
- ``mrcc_tpu.sparse``    — TPU sparse-voxel tensor core (quantize, kernel maps,
  sparse conv / transpose conv / pooling on fixed-shape padded buffers)
- ``mrcc_tpu.ops``       — Pallas kernels + dense point ops (FPS, ball query, NN)
- ``mrcc_tpu.models``    — MinkUNet family, RobotNet heads, PointNet(2), FeatureNet
- ``mrcc_tpu.data``      — dataset pipeline, synthetic sample generator, augmentation
- ``mrcc_tpu.solve``     — ICP, clustering, keypoint→pose, calibration solve
- ``mrcc_tpu.train``     — optax trainers, losses, checkpointing
- ``mrcc_tpu.eval``      — evaluation harnesses and reports
- ``mrcc_tpu.app``       — InferenceEngine product API + DTOs + data engines
- ``mrcc_tpu.parallel``  — jax.sharding mesh utilities (data-parallel over ICI)

All compute-path code is pure JAX (jit/vmap/pjit-compatible, static shapes).
Host-side runtime pieces (data loading, voxel pre-quantization) have native
C++ implementations under ``runtime/`` with ctypes bindings and pure-Python
fallbacks.
"""

__version__ = "0.1.0"


def enable_compilation_cache():
    """Opt-in persistent XLA compilation cache (no-op under
    MRCC_NO_COMPILE_CACHE=1).

    On this remote-compiled TPU runtime a cold compile of the fused
    inference program takes minutes; the persistent cache makes every
    relaunch (bench, training scripts, the driver's own bench run) reuse
    prior compiles.  Harmless on CPU test runs (min-compile-time gate).

    Called explicitly by the repo entry points (bench.py, the train/test
    CLIs, __graft_entry__) rather than at package import: importing a
    library should not mutate global jax config or write to the
    filesystem (~/.cache/mrcc_jax).  Downstream consumers opt in by
    calling this once before their first compile.
    """
    import os

    if os.environ.get("MRCC_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/mrcc_jax"))
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
