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
