"""InferenceEngine — the product API (predict / calibrate / check_sanity).

Parity target: /root/reference/app/inference_engine.py:54-559, redesigned
TPU-first: the whole hot path — color normalisation, voxelization,
segmentation U-Net, largest-cluster filtering, EE crop, rotation network,
magic-point translation, keypoint network, Kabsch solve and both ICP
refinements — is ONE fused jit program over fixed-shape buffers
(``_predict_impl``).  The reference runs these as seven separate
GPU/CPU/sklearn/Open3D stages at ~1.25 FPS (app/main.py:456); here a whole
batch of clouds flows through a single XLA executable.

Host-side remains: DTO packing, the geometric sanity check (tiny numpy), and
calibration averaging across frames/positions.
"""

from __future__ import annotations

import dataclasses
import typing
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data.labels import get_6_key_points
from ..geometry import base2cam_pose, transform_pose2pose
from ..geometry import calibration as calib_util
from ..geometry.metrics import compute_kp_error
from ..geometry.preprocess import center_at_origin, normalize_colors
from ..models import RobotNetEncode, RobotNetSegmentation
from ..solve import (
    default_template,
    disambiguate_flip,
    icp_refine,
    key_point_predictions,
    largest_cluster_mask,
    pose_from_key_points,
    predict_translation,
)
from ..sparse import build_hierarchy, slice_to_points, voxelize
from .dto import CalibrationResultDTO, PointCloudDTO, ResultDTO, TestResultDTO


@dataclasses.dataclass
class InferenceConfig:
    """Explicit replacement for the INFERENCE config section
    (config/default.yaml:136-192)."""

    # capacities (static shapes; choose by scene size — see
    # scripts/bench_stages.py occupancy probes; saturated capacities
    # silently drop voxels, so the seg stage also reports an overflow flag)
    point_capacity: int = 32768
    seg_voxel_capacity: int = 16384
    ee_point_capacity: int = 8192
    ee_voxel_capacity: int = 4096
    kp_voxel_capacity: int = 8192
    # optional measured per-level capacities for stride levels 1..4
    # (default: halving from the stage capacity — generous for subsampled
    # clouds, tight for dense ones)
    seg_hierarchy_caps: typing.Optional[typing.Tuple[int, ...]] = None
    ee_hierarchy_caps: typing.Optional[typing.Tuple[int, ...]] = None
    kp_hierarchy_caps: typing.Optional[typing.Tuple[int, ...]] = None

    # stage configs (defaults = reference defaults, except seg_backbone:
    # the r4 backbone study measured default-PLANES minkunet18 at equal-
    # or-better held-out accuracy than every single-chip-trainable config
    # and 1.60x the 18D pipeline — the reference's 18D stays one config
    # switch away ('minkunet'), and YAML-driven engines still read the
    # explicit INFERENCE.*.backbone fields (default.yaml keeps 'minkunet')
    seg_backbone: str = "minkunet18"
    seg_scale: float = 200.0
    seg_center_at_origin: bool = True
    num_classes: int = 3

    rot_backbone: str = "minkunet"
    rot_encode_only: bool = True
    rot_scale: float = 200.0
    rot_center_at_origin: bool = True
    # conv impl for the ROTATION stage only (None = follow conv_impl,
    # except 'pallas-int8' demotes rotation to the bf16 kernels: the
    # measured r4 gate shows int8 seg/kp within noise but the rotation
    # REGRESSOR degrading ~29% — regression heads are quantization-
    # sensitive where per-voxel classification is not.  Rotation is
    # ~13 ms of the ~310 ms pipeline, so bf16 there is free.)
    rot_conv_impl: typing.Optional[str] = None
    # confidence heads (STRUCTURE.compute_confidence): rotation net emits
    # 10 channels — pose[7] + sigmoid(conf_pos, conf_rot, conf)
    # (robotnet.py:79, utils/loss.py:74-116); the combined head gates
    # is_confident alongside the geometric sanity check
    compute_confidence: bool = False
    confidence_threshold: float = 0.5

    # sparse path; 'pointnet2' = dense.  Default follows the seg-backbone
    # study: keypoint heads are the same per-voxel classification family
    # (the int8 gate showed them MORE robust than seg), and the trained
    # demo's kp accuracy was produced by the still-cheaper 14A; the c384
    # decoder buys nothing measurable (+6.6% pipeline from this flip).
    kp_backbone: str = "minkunet18"
    kp_scale: float = 800.0
    kp_center_at_origin: bool = True
    kp_conf_threshold: float = 0.75
    num_of_keypoints: int = 6
    kp_error_margin: float = 0.05
    # dense (pointnet2) keypoint path (reference predict_key_points
    # :491-559): fixed-size point sample through PointNet2SSG
    num_of_dense_input_points: int = 2048
    kp_sampling_method: str = "uniform"   # 'uniform' | 'farthest'
    kp_use_coordinates_as_features: bool = False

    # trained-weight checkpoints (INFERENCE.*.checkpoint fields,
    # config/default.yaml:136-192); ``mrcc_tpu.train.checkpoint`` format.
    # When set, the engine constructs itself from YAML alone — parity with
    # the reference ctor loading three checkpoints
    # (app/inference_engine.py:54-126).
    seg_checkpoint: typing.Optional[str] = None
    rot_checkpoint: typing.Optional[str] = None
    kp_checkpoint: typing.Optional[str] = None

    # opt-in continuous 6D rotation head (ROADMAP #8): the rotation net
    # emits [pos(3), 6d(6), conf?] and the engine converts 6d -> quaternion
    # (geometry.transform.rot6d_to_quat); default keeps the reference's
    # quaternion head (robotnet.py:79-83)
    rot_6d: bool = False
    # opt-in test-time gripper-symmetry flip disambiguation (ROADMAP r5
    # #2): when the keypoint Kabsch pose (whose classes are NOT symmetric)
    # says the rotation regressor picked the wrong 180°-about-z branch,
    # flip it and recompute the magic translation (solve/symmetry.py)
    rot_flip_disambiguation: bool = False
    rot_symmetry_axis: str = "z"
    # opt-in robust translation (ROADMAP r5 #3): p-th percentile of the
    # rotated-frame z instead of the reference's hard min (the "magic"
    # point, inference_engine.py:459-489) — None preserves the quirk;
    # a stray mislabeled EE voxel moves a hard min by centimetres
    translation_z_percentile: typing.Optional[float] = None
    # self-keyed k3 convs (no neighbour tables; ops/conv_pallas.py):
    # skips the rank-kernel k3 table build on every level the per-impl
    # gate accepts (bf16 unpacked/packed, int8 packed to production
    # capacities).  Default ON since r5: certified on-chip, +15% headline
    # throughput, differentiable (custom VJP) — non-Pallas impls and f32
    # compute dtypes demote automatically
    k3_self_keyed: bool = True
    compute_dtype: str = "bfloat16"  # conv-path compute (f32 accumulation)
    # sparse-conv implementation: 'auto' = Pallas windowed gather-GEMM on
    # TPU (ops/conv_pallas.py), XLA gathers elsewhere; or force
    # 'pallas'/'xla'
    conv_impl: str = "auto"
    ee_point_counts_threshold: int = 512
    icp_enabled: bool = True
    icp_iterations: int = 30
    icp_template_points: int = 2048
    cluster_dist: float = 0.06
    # exact-cluster compaction capacity; None = max(4096, ee_point_capacity)
    # (the reference clusters ALL predicted-EE points, utils/output.py:13-28
    # — production crops exceed 4096, so the capacity scales with the crop)
    cluster_capacity: typing.Optional[int] = None
    sanity_min_num_of_ee_points: int = 2048
    camera_link_transformation_pose: typing.Optional[np.ndarray] = None
    calibration_confident_count: int = 2


def cluster_capacity(cfg: InferenceConfig) -> int:
    """Exact-cluster capacity: explicit, else scaled to the EE crop."""
    if cfg.cluster_capacity is not None:
        return cfg.cluster_capacity
    return max(4096, cfg.ee_point_capacity)


class InferenceEngine:
    """Config-driven engine with the same public surface as the reference:
    ``predict(PointCloudDTO) -> ResultDTO`` and
    ``calibrate({position: [ResultDTO]}) -> CalibrationResultDTO``."""

    def __init__(self, config: InferenceConfig = None, params=None, seed=0,
                 calibration_only: bool = False, mesh=None):
        """``mesh``: optional jax.sharding.Mesh — batch-shards every stage
        over the devices (multi-chip inference throughput; the batch axis is
        embarrassingly parallel, XLA propagates the sharding)."""
        self.cfg = config or InferenceConfig()
        cfg = self.cfg
        self.template = jnp.asarray(default_template(cfg.icp_template_points))
        self.pred_enabled = not calibration_only
        self.mesh = mesh

        if calibration_only:
            return

        self._seg_model = RobotNetSegmentation(
            backbone=cfg.seg_backbone, in_channels=3,
            num_classes=cfg.num_classes)
        rot_pose_w = 9 if cfg.rot_6d else 7
        self._rot_model = RobotNetEncode(
            backbone=cfg.rot_backbone, in_channels=3,
            out_channels=rot_pose_w + (3 if cfg.compute_confidence else 0),
            rot_dims=6 if cfg.rot_6d else 4)
        self._kp_dense = cfg.kp_backbone == "pointnet2"
        if self._kp_dense:
            from ..models import PointNet2SSG

            self._kp_model = PointNet2SSG(num_classes=cfg.num_of_keypoints,
                                          in_channels=3)
        else:
            self._kp_model = RobotNetSegmentation(
                backbone=cfg.kp_backbone, in_channels=3,
                num_classes=cfg.num_of_keypoints)

        if params is None:
            params = self.init_params(jax.random.PRNGKey(seed))
            params = self._load_checkpoints(params)
        self.params = params
        # Stage-wise jit: four moderate programs instead of one huge one —
        # compiles are independent (and cache-friendly); intermediate arrays
        # stay on device between stages, so no host round-trips.
        # params are ARGUMENTS (not closures): closed-over arrays embed as
        # HLO constants, which breaks remote compilation on large models.
        if cfg.conv_impl == "auto":
            self._conv_impl = ("pallas" if jax.default_backend() == "tpu"
                               else "xla")
        else:
            self._conv_impl = cfg.conv_impl
        rot_impl = cfg.rot_conv_impl
        if rot_impl is None:
            rot_impl = ("pallas" if self._conv_impl == "pallas-int8"
                        else self._conv_impl)
        elif rot_impl == "auto":
            rot_impl = ("pallas" if jax.default_backend() == "tpu"
                        else "xla")
        self._rot_impl = rot_impl
        self._seg_jit = self._stage_jit(self._seg_stage)
        self._pose_jit = self._stage_jit(self._pose_stage)
        self._kp_jit = self._stage_jit(self._kp_stage)
        self._icp_jit = self._stage_jit(self._icp_stage, with_impl=False)
        self._flip_jit = self._stage_jit(self._flip_stage, with_impl=False)
        # the throughput path: seg -> pose -> kp -> 2x ICP as ONE program
        # (ROADMAP #4 — stage dispatch costs 1.3-2.5 ms/call on this
        # runtime; the reference runs seven separate GPU/CPU stages)
        self._full_jit = self._stage_jit(self._full_pipeline)

    def _stage_jit(self, fn, with_impl=True):
        """jit one stage; under a mesh, shard_map it over the batch axis.

        Every stage is batch-parallel (arg 0 is the replicated params /
        template pytree, all other args and every output are batch-leading),
        so shard_map needs NO collectives — and, unlike bare jit sharding,
        it partitions the Pallas kernels too: each device runs the kernel
        on its local batch shard (round-2 fell back to XLA under a mesh)."""
        wrapped = self._with_impl(fn) if with_impl else fn
        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS

            def sharded(first, *rest):
                n_rest = len(rest)
                return jax.shard_map(
                    wrapped, mesh=self.mesh,
                    in_specs=(P(),) + (P(DATA_AXIS),) * n_rest,
                    out_specs=P(DATA_AXIS),
                    check_vma=False)(first, *rest)

            return jax.jit(sharded)
        return jax.jit(wrapped)

    def _with_impl(self, fn):
        """Bind the conv implementation at TRACE time (jit caches the traced
        graph, so the context only needs to be live during tracing)."""
        from ..sparse.conv import conv_impl as _conv_impl_ctx

        def wrapped(*args, **kwargs):
            with _conv_impl_ctx(self._conv_impl):
                return fn(*args, **kwargs)

        return wrapped

    # ------------------------------------------------------------- params

    def _dummy_inputs(self, n=256):
        pts = jnp.zeros((1, n, 3), jnp.float32)
        rgb = jnp.zeros((1, n, 3), jnp.float32)
        mask = jnp.ones((1, n), bool).at[0, n // 2:].set(False)
        return pts, rgb, mask

    def init_params(self, key):
        """Randomly-initialised parameter set (use checkpoint loading from
        mrcc_tpu.train.checkpoint for trained weights).

        Entirely under jit: eager init is minutes-slow on remote-compiled
        backends (see mrcc_tpu.utils.jit_init)."""
        cfg = self.cfg
        pts, rgb, mask = self._dummy_inputs()

        @jax.jit
        def init_all(key, pts, rgb, mask):
            k1, k2, k3 = jax.random.split(key, 3)
            svox, _, _ = voxelize(pts, rgb, mask, 1 / cfg.seg_scale, 256)
            slevels = build_hierarchy(svox, 4, capacities=(128, 64, 64, 64))
            if self._kp_dense:
                x = jnp.concatenate([pts, rgb], axis=-1)
                kp_vars = self._kp_model.init(k3, x)
            else:
                kp_vars = self._kp_model.init(k3, svox.feats, slevels)
            return {
                "segmentation": self._seg_model.init(k1, svox.feats, slevels),
                "rotation": self._rot_model.init(k2, svox.feats, slevels),
                "key_points": kp_vars,
            }

        return init_all(key, pts, rgb, mask)

    def _load_checkpoints(self, params):
        """Load trained weights for each stage whose checkpoint is configured
        (reference ctor: three checkpoint loads, inference_engine.py:54-126).

        Checkpoints are ``mrcc_tpu.train.checkpoint`` files holding a full
        TrainState; only params/batch_stats are taken.  ``.pth`` files go
        through the reference-interop importer (train/interop.py)."""
        import flax.serialization

        cfg = self.cfg
        stages = {"segmentation": cfg.seg_checkpoint,
                  "rotation": cfg.rot_checkpoint,
                  "key_points": cfg.kp_checkpoint}
        for stage, path in stages.items():
            if not path:
                continue
            if path.endswith(".pth"):
                from ..train.interop import import_pth_variables

                params[stage] = import_pth_variables(path, params[stage])
                continue
            with open(path, "rb") as f:
                raw = flax.serialization.msgpack_restore(f.read())
            variables = {"params": raw["params"],
                         "batch_stats": raw.get("batch_stats", {})}
            params[stage] = flax.serialization.from_state_dict(
                params[stage], variables)
        return params

    def calibrate_q8(self, points, rgb, mask):
        """Record static int8 activation scales from a representative batch.

        The quantized conv path (``conv_impl="pallas-int8"``) needs a
        per-channel activation absmax for every sparse conv; without
        calibration it re-reduces the whole feature tensor per conv per
        call.  One pass here stores the scales in each stage's
        ``q8_stats`` collection (sparse/nn.py ``_q8_calibration``) — later
        applies pick them up automatically (flax retraces on the new
        params structure).  Call with inputs shaped like production
        traffic; re-call to widen the running absmax with more batches.
        """
        from functools import partial as _partial

        p = self.params
        seg_fn = jax.jit(_partial(self._with_impl(self._seg_stage),
                                  mutable_q8=True))
        *seg_outs, q8 = seg_fn(p["segmentation"], points, rgb, mask)
        if q8["q8_stats"]:
            p["segmentation"] = {**p["segmentation"], **q8}
        _, _, ee_pts, ee_rgb, ee_valid, _ = seg_outs

        pose_fn = jax.jit(_partial(self._with_impl(self._pose_stage),
                                   mutable_q8=True))
        *_, q8 = pose_fn(p["rotation"], ee_pts, ee_rgb, ee_valid)
        if q8["q8_stats"]:
            p["rotation"] = {**p["rotation"], **q8}

        kp_fn = jax.jit(_partial(self._with_impl(self._kp_stage),
                                 mutable_q8=True))
        *_, q8 = kp_fn(p["key_points"], ee_pts, ee_rgb, ee_valid)
        if q8["q8_stats"]:
            p["key_points"] = {**p["key_points"], **q8}
        return self.params

    # ------------------------------------------------------------ the jit

    def _hierarchy_caps(self, cap, override=None):
        if override is not None:
            assert len(override) == 4
            return tuple(override)
        return (cap, max(cap // 2, 64), max(cap // 4, 64), max(cap // 8, 64))

    @property
    def _k3_sk(self) -> bool:
        """Self-keyed k3 routing, guarded to bf16 compute dtype: the
        build-time gate (hierarchy._use_self_keyed) resolves per-impl
        (itemsize 2 for 'pallas', 1 for 'pallas-int8' — each stage's
        hierarchy builds inside its own impl context, so an int8 engine's
        demoted bf16 rotation stage gates itself correctly), but an f32
        engine would pass the itemsize-2 build gate and trip conv_k3's
        per-dtype assert — f32 engines keep tables."""
        return (self.cfg.k3_self_keyed
                and jnp.dtype(self.cfg.compute_dtype).itemsize == 2)

    def _seg_stage(self, params, points, rgb, mask, mutable_q8=False):
        """Segmentation + cluster filter + fixed-capacity EE crop.

        Parity: predict_segmentation (:395-435) + the EE gather.
        ``mutable_q8``: calibration mode — record int8 activation scales
        (appends the updated q8_stats collection to the return)."""
        cfg = self.cfg
        rgb = normalize_colors(rgb, mask=mask)
        if cfg.seg_center_at_origin:
            seg_pts, _ = center_at_origin(points, mask=mask)
        else:
            seg_pts = points
        svox, spv, _ = voxelize(seg_pts, rgb, mask, 1.0 / cfg.seg_scale,
                                cfg.seg_voxel_capacity)
        slevels = build_hierarchy(
            svox, 4, capacities=self._hierarchy_caps(cfg.seg_voxel_capacity,
                                                     cfg.seg_hierarchy_caps),
            k3_self_keyed=self._k3_sk)
        sfeats = svox.feats.astype(jnp.dtype(cfg.compute_dtype))
        if mutable_q8:
            slogits, q8_upd = self._seg_model.apply(
                params, sfeats, slevels, mutable=["q8_stats"])
        else:
            slogits = self._seg_model.apply(params, sfeats, slevels)
        slogits = slogits.astype(jnp.float32)
        pt_logits = slice_to_points(slogits, spv, fill_value=-1e9)
        seg = jnp.argmax(pt_logits, axis=-1).astype(jnp.int32)
        seg = jnp.where(mask, seg, 0)

        # EE demote + largest-cluster re-promotion (:422-434)
        ee_raw = (seg == 2) & mask
        ccap = cluster_capacity(cfg)
        cluster = jax.vmap(
            partial(largest_cluster_mask, dist=cfg.cluster_dist,
                    capacity=ccap)
        )(points, ee_raw)
        seg = jnp.where(ee_raw, 1, seg)
        seg = jnp.where(ee_raw & cluster, 2, seg)
        ee_mask = (seg == 2) & mask
        ee_count = ee_mask.sum(axis=-1)

        # EE crop into fixed capacity (argsort: EE rows first, stable)
        e = cfg.ee_point_capacity
        order = jnp.argsort(~ee_mask, axis=-1, stable=True)[:, :e]
        ee_pts = jnp.take_along_axis(points, order[..., None], axis=1)
        ee_rgb = jnp.take_along_axis(rgb, order[..., None], axis=1)
        ee_valid = jnp.take_along_axis(ee_mask, order, axis=1)
        # capacity saturation flag: a full voxel buffer means voxels were
        # silently dropped — callers should treat results as degraded
        overflow = svox.count >= cfg.seg_voxel_capacity
        out = (seg, ee_count, ee_pts, ee_rgb, ee_valid, overflow)
        return out + (q8_upd,) if mutable_q8 else out

    def _pose_stage(self, params, ee_pts, ee_rgb, ee_valid,
                    mutable_q8=False):
        """Rotation net + magic translation (predict_rotation :437 +
        predict_translation :459).

        Traced under ``self._rot_impl`` (nested impl context overrides the
        engine-wide one): under 'pallas-int8' the rotation regressor stays
        on the bf16 kernels — see InferenceConfig.rot_conv_impl."""
        from ..sparse.conv import conv_impl as _rot_ctx

        with _rot_ctx(self._rot_impl):
            return self._pose_stage_impl(params, ee_pts, ee_rgb, ee_valid,
                                         mutable_q8=mutable_q8)

    def _pose_stage_impl(self, params, ee_pts, ee_rgb, ee_valid,
                         mutable_q8=False):
        cfg = self.cfg
        if cfg.rot_center_at_origin:
            rot_pts, _ = center_at_origin(ee_pts, mask=ee_valid)
        else:
            rot_pts = ee_pts
        rvox, _, _ = voxelize(rot_pts, ee_rgb, ee_valid, 1.0 / cfg.rot_scale,
                              cfg.ee_voxel_capacity)
        rlevels = build_hierarchy(
            rvox, 4, capacities=self._hierarchy_caps(cfg.ee_voxel_capacity,
                                                     cfg.ee_hierarchy_caps),
            k3_self_keyed=self._k3_sk)
        rfeats = rvox.feats.astype(jnp.dtype(cfg.compute_dtype))
        if mutable_q8:
            rot_out, q8_upd = self._rot_model.apply(
                params, rfeats, rlevels, train=False, mutable=["q8_stats"])
            rot_out = rot_out.astype(jnp.float32)
        else:
            rot_out = self._rot_model.apply(params, rfeats, rlevels,
                                            train=False).astype(jnp.float32)
        if cfg.rot_6d:
            from ..geometry.transform import rot6d_to_quat

            q = rot6d_to_quat(rot_out[:, 3:9])
            conf_off = 9
        else:
            q = rot_out[:, 3:7]
            conf_off = 7
        pos, _ = jax.vmap(partial(
            predict_translation,
            z_percentile=cfg.translation_z_percentile))(ee_pts, ee_valid, q)
        # confidences (already sigmoided by the model head) or ones
        if rot_out.shape[-1] > conf_off:
            conf = rot_out[:, conf_off:conf_off + 3]
        else:
            conf = jnp.ones((rot_out.shape[0], 3), jnp.float32)
        out = (jnp.concatenate([pos, q], axis=-1), conf)
        return out + (q8_upd,) if mutable_q8 else out

    def _kp_stage_dense(self, params, ee_pts, ee_rgb, ee_valid):
        """Dense keypoint path (predict_key_points :512-537, pointnet2):
        fixed-size sample -> PointNet2SSG -> per-class softmax-max -> Kabsch.

        Sampling is uniform (deterministic PRNG — the reference uses
        np.random.choice) or farthest-point per ``kp_sampling_method``.
        Items with fewer valid points than ``num_of_dense_input_points``
        yield kp_found = False everywhere (the reference returns empty).
        """
        cfg = self.cfg
        nd = cfg.num_of_dense_input_points
        b = ee_pts.shape[0]
        if cfg.kp_center_at_origin:
            kp_pts, _ = center_at_origin(ee_pts, mask=ee_valid)
        else:
            kp_pts = ee_pts
        if cfg.kp_use_coordinates_as_features:
            from ..geometry.preprocess import normalize_points

            feats = normalize_points(kp_pts, mask=ee_valid)
        else:
            feats = ee_rgb

        if cfg.kp_sampling_method == "farthest":
            from ..ops.points import farthest_point_sample

            # park invalid rows on the first point (distance 0: never chosen
            # while real points remain)
            anchor = kp_pts[:, :1]
            fps_in = jnp.where(ee_valid[..., None], kp_pts, anchor)
            order = farthest_point_sample(fps_in, nd)           # [B, nd]
        else:
            r = jax.random.uniform(jax.random.PRNGKey(0), (b, ee_pts.shape[1]))
            r = jnp.where(ee_valid, r, 2.0)                     # invalid last
            order = jnp.argsort(r, axis=-1)[:, :nd].astype(jnp.int32)

        take = lambda a: jnp.take_along_axis(a, order[..., None], axis=1)
        x = jnp.concatenate([take(kp_pts), take(feats)], axis=-1)
        logits, _ = self._kp_model.apply(params, x)             # [B, nd, K]
        s_valid = jnp.take_along_axis(ee_valid, order, axis=1)
        kp_idx_s, kp_found, kp_conf = jax.vmap(
            partial(key_point_predictions,
                    conf_threshold=cfg.kp_conf_threshold)
        )(logits.astype(jnp.float32), s_valid)
        enough = ee_valid.sum(axis=-1) >= nd                    # :513
        kp_found = kp_found & enough[:, None]
        kp_idx = jnp.take_along_axis(order, kp_idx_s, axis=1)   # sample->ee
        kp_coords = jnp.take_along_axis(ee_pts, kp_idx[..., None], axis=1)
        kp_pose, kp_ok = jax.vmap(pose_from_key_points)(kp_coords, kp_found)
        return kp_pose, kp_ok, kp_coords, kp_found, kp_conf

    def _kp_stage(self, params, ee_pts, ee_rgb, ee_valid,
                  mutable_q8=False):
        """Keypoint net + Kabsch solve (predict_key_points :491, sparse)."""
        if self._kp_dense:
            out = self._kp_stage_dense(params, ee_pts, ee_rgb, ee_valid)
            # dense PointNet2 has no sparse convs: nothing to calibrate
            return out + ({"q8_stats": {}},) if mutable_q8 else out
        cfg = self.cfg
        if cfg.kp_center_at_origin:
            kp_pts, _ = center_at_origin(ee_pts, mask=ee_valid)
        else:
            kp_pts = ee_pts
        kvox, kpv, _ = voxelize(kp_pts, ee_rgb, ee_valid, 1.0 / cfg.kp_scale,
                                cfg.kp_voxel_capacity)
        klevels = build_hierarchy(
            kvox, 4, capacities=self._hierarchy_caps(cfg.kp_voxel_capacity,
                                                     cfg.kp_hierarchy_caps),
            k3_self_keyed=self._k3_sk)
        kfeats = kvox.feats.astype(jnp.dtype(cfg.compute_dtype))
        if mutable_q8:
            klogits, q8_upd = self._kp_model.apply(
                params, kfeats, klevels, mutable=["q8_stats"])
        else:
            klogits = self._kp_model.apply(params, kfeats, klevels)
        klogits = klogits.astype(jnp.float32)
        kp_pt_logits = slice_to_points(klogits, kpv, fill_value=-1e9)
        kp_idx, kp_found, kp_conf = jax.vmap(
            partial(key_point_predictions,
                    conf_threshold=cfg.kp_conf_threshold)
        )(kp_pt_logits, ee_valid)
        kp_coords = jnp.take_along_axis(ee_pts, kp_idx[..., None], axis=1)
        kp_pose, kp_ok = jax.vmap(pose_from_key_points)(kp_coords, kp_found)
        out = (kp_pose, kp_ok, kp_coords, kp_found, kp_conf)
        return out + (q8_upd,) if mutable_q8 else out

    def _flip_stage(self, _unused, ee_pose, kp_pose, kp_ok, ee_pts,
                    ee_valid):
        """Opt-in gripper-symmetry disambiguation (solve/symmetry.py):
        batched over items; params slot unused (stage signature parity)."""
        cfg = self.cfg
        fixed, _ = jax.vmap(partial(
            disambiguate_flip, axis=cfg.rot_symmetry_axis,
            z_percentile=cfg.translation_z_percentile))(
                ee_pose, kp_pose, kp_ok, ee_pts, ee_valid)
        return fixed

    def _icp_stage(self, template, ee_pts, ee_valid, ee_pose, kp_pose):
        """Both ICP refinements (:358-361)."""
        refine = jax.vmap(
            lambda pts, m, pose: icp_refine(
                template, pts, m, pose,
                iterations=self.cfg.icp_iterations))
        return (refine(ee_pts, ee_valid, ee_pose),
                refine(ee_pts, ee_valid, kp_pose))

    def _full_pipeline(self, bundle, points, rgb, mask):
        """The whole predict path as one traceable function.

        ``bundle`` = {"params": engine params, "template": ICP template} —
        everything replicated; all other args/outputs are batch-leading
        (shard_map-compatible)."""
        params = bundle["params"]
        seg, ee_count, ee_pts, ee_rgb, ee_valid, seg_overflow = \
            self._seg_stage(params["segmentation"], points, rgb, mask)
        ee_pose, rot_conf = self._pose_stage(params["rotation"], ee_pts,
                                             ee_rgb, ee_valid)
        kp_pose, kp_ok, kp_coords, kp_found, kp_conf = self._kp_stage(
            params["key_points"], ee_pts, ee_rgb, ee_valid)
        if self.cfg.rot_flip_disambiguation:
            # RELAXED inputs for the flip decision (r5): kp_ok demands >=4
            # found keypoints (the reference's Kabsch-pose validity bar),
            # but the BINARY branch choice has a pi/2 margin — so the
            # decision uses a Kabsch pose over the union of the found
            # classes and the 3 MOST CONFIDENT classes (argmax coords
            # exist for every class; 3 non-collinear template points fix
            # the orientation).  Without this, frames whose kp confidences
            # sit under the threshold pass a possibly-flipped pose
            # through — measured as the pi rotation outliers in
            # trained_benchmark_r5 (max 3.03 rad).
            from ..solve import pose_from_key_points

            top3 = kp_conf >= jnp.sort(kp_conf, axis=-1)[:, -3:-2]
            flip_found = kp_found | top3
            flip_pose, _ = jax.vmap(pose_from_key_points)(kp_coords,
                                                          flip_found)
            flip_ok = jnp.sum(flip_found, axis=-1) >= 3
            ee_pose = self._flip_stage(None, ee_pose, flip_pose, flip_ok,
                                       ee_pts, ee_valid)
        if self.cfg.icp_enabled:
            ee_pose, kp_pose = self._icp_stage(
                bundle["template"], ee_pts, ee_valid, ee_pose, kp_pose)
        return {
            "segmentation": seg,
            "seg_overflow": seg_overflow,
            "ee_count": ee_count,
            "ee_pose": ee_pose,
            "rot_conf": rot_conf,
            "kp_pose": kp_pose,
            "kp_ok": kp_ok,
            "kp_coords": kp_coords,
            "kp_found": kp_found,
            "kp_conf": kp_conf,
        }

    # ------------------------------------------------------------- public

    def predict_batch_arrays(self, points, rgb, mask):
        """Batched prediction on padded arrays (throughput path).

        ONE fused jit program (seg -> cluster -> crop -> rotation ->
        translation -> keypoints -> Kabsch -> 2x ICP); intermediates never
        leave the device(s).  With a mesh the program is shard_map'd over
        the batch axis, Pallas kernels included."""
        if self.mesh is not None:
            from ..parallel.mesh import batch_sharding, replicate

            sharding = batch_sharding(self.mesh)
            points = jax.device_put(points, sharding)
            rgb = jax.device_put(rgb, sharding)
            mask = jax.device_put(mask, sharding)
            if not getattr(self, "_params_replicated", False):
                self.params = replicate(self.params, self.mesh)
                self.template = jax.device_put(
                    self.template,
                    jax.sharding.NamedSharding(self.mesh,
                                               jax.sharding.PartitionSpec()))
                self._params_replicated = True
        bundle = {"params": self.params, "template": self.template}
        if jax.default_backend() == "cpu":
            # XLA-CPU compiles the fused program MUCH slower than the four
            # stages, and fusion only pays against the TPU tunnel's
            # 1.3-2.5 ms/dispatch floor — run the staged jits off-TPU
            # (identical math: the stages are the fused program's pieces).
            params = bundle["params"]
            seg, ee_count, ee_pts, ee_rgb, ee_valid, seg_overflow = \
                self._seg_jit(params["segmentation"], points, rgb, mask)
            ee_pose, rot_conf = self._pose_jit(params["rotation"], ee_pts,
                                               ee_rgb, ee_valid)
            kp_pose, kp_ok, kp_coords, kp_found, kp_conf = self._kp_jit(
                params["key_points"], ee_pts, ee_rgb, ee_valid)
            if self.cfg.rot_flip_disambiguation:
                ee_pose = self._flip_jit(None, ee_pose, kp_pose, kp_ok,
                                         ee_pts, ee_valid)
            if self.cfg.icp_enabled:
                ee_pose, kp_pose = self._icp_jit(
                    bundle["template"], ee_pts, ee_valid, ee_pose, kp_pose)
            return {
                "segmentation": seg,
                "seg_overflow": seg_overflow,
                "ee_count": ee_count,
                "ee_pose": ee_pose,
                "rot_conf": rot_conf,
                "kp_pose": kp_pose,
                "kp_ok": kp_ok,
                "kp_coords": kp_coords,
                "kp_found": kp_found,
                "kp_conf": kp_conf,
            }
        return self._full_jit(bundle, points, rgb, mask)

    def _pad(self, points, rgb):
        """Pad (and, if over capacity, subsample) one cloud to the static
        point capacity.

        Returns ``(pts, cols, mask, n, sel)`` where ``sel`` is the index of
        each kept row in the ORIGINAL cloud (None when nothing was dropped)
        — callers must scatter per-point outputs back through ``sel`` so
        results stay aligned with ``data.points`` (the reference runs on all
        points; silently returning sampled-order labels misaligns every
        downstream per-point consumer)."""
        p = self.cfg.point_capacity
        n = len(points)
        sel = None
        if n > p:
            sel = np.sort(np.random.default_rng(0).choice(n, p, replace=False))
            points, rgb = points[sel], rgb[sel]
            n = p
        pts = np.zeros((1, p, 3), np.float32)
        cols = np.zeros((1, p, 3), np.float32)
        mask = np.zeros((1, p), bool)
        pts[0, :n] = points
        cols[0, :n] = rgb
        mask[0, :n] = True
        return pts, cols, mask, n, sel

    def predict(self, data: PointCloudDTO) -> ResultDTO:
        """Single-cloud prediction; parity with predict (:281-382)."""
        if not self.pred_enabled:
            return ResultDTO(segmentation=np.zeros(len(data.points), np.int32))

        points = np.asarray(data.points, np.float32)
        pts, cols, mask, n, sel = self._pad(points,
                                            np.asarray(data.rgb, np.float32))
        out = jax.device_get(self.predict_batch_arrays(pts, cols, mask))

        seg = out["segmentation"][0][:n]
        if sel is not None:
            # scatter sampled labels back to full cloud length via nearest
            # sampled point (unsampled points inherit their neighbour's
            # label) so seg aligns with data.points
            full = np.zeros(len(points), np.int32)
            full[sel] = seg
            unsel = np.ones(len(points), bool)
            unsel[sel] = False
            if unsel.any():
                from scipy.spatial import cKDTree

                _, nn = cKDTree(points[sel]).query(points[unsel], k=1)
                full[unsel] = seg[nn]
            seg = full
        result = ResultDTO(segmentation=seg)
        if int(out["ee_count"][0]) < self.cfg.ee_point_counts_threshold:
            return result

        result.ee_pose = out["ee_pose"][0]
        found = out["kp_found"][0]
        result.key_points = [
            (int(k), out["kp_coords"][0][k])
            for k in range(self.cfg.num_of_keypoints) if found[k]
        ]
        result.key_points_pose = out["kp_pose"][0] if bool(out["kp_ok"][0]) else None
        result.confidence = float(out["rot_conf"][0][2])

        result.is_confident = self.check_sanity(data, result)
        if self.cfg.compute_confidence:
            # learned combined-confidence head gates alongside the
            # geometric sanity check
            result.is_confident = (result.is_confident and
                                   result.confidence
                                   > self.cfg.confidence_threshold)

        if data.ee2base_pose is not None:
            if result.ee_pose is not None:
                result.base_pose = np.asarray(
                    base2cam_pose(result.ee_pose, data.ee2base_pose))
            if result.key_points_pose is not None:
                result.key_points_base_pose = np.asarray(
                    base2cam_pose(result.key_points_pose, data.ee2base_pose))
        return result

    # ---------------------------------------------------------- sanity

    def check_sanity(self, data: PointCloudDTO, result: ResultDTO,
                     kp_error_margin=None) -> bool:
        """Parity with check_sanity (:246-279)."""
        cfg = self.cfg
        kp_error_margin = kp_error_margin or cfg.kp_error_margin
        seg = result.segmentation
        num_ee = int((seg == 2).sum())
        if num_ee < cfg.sanity_min_num_of_ee_points:
            return False
        if result.ee_pose is None:
            return False

        ee_raw_points = np.asarray(data.points)[: len(seg)][seg == 2]
        kp_gt_coords, kp_gt_classes = get_6_key_points(
            ee_raw_points, np.asarray(result.ee_pose),
            euclidean_threshold=0.04)
        if len(kp_gt_classes) == 0 or (np.asarray(kp_gt_classes[:4]) < 0).any():
            return False

        if len(result.key_points) > 3:
            kp_classes = np.array([k for k, _ in result.key_points])
            kp_coords = np.array([c for _, c in result.key_points])
            err = float(compute_kp_error(kp_gt_coords, kp_coords, kp_classes))
            if err > kp_error_margin:
                return False
        return True

    # ------------------------------------------------------- calibration

    def calibrate(self, data: typing.Dict[str, typing.List[ResultDTO]]
                  ) -> CalibrationResultDTO:
        """Parity with calibrate (:152-194): per-position averaging, then
        cross-position averaging, then mean of (base, kp-base) poses."""
        individual = [self._calibrate_individual(v) for v in data.values()]
        individual = [v for v in individual if v is not None]
        if len(data) == 1 and individual:
            raw = individual[0]
        else:
            raw = self._calibrate_individual(individual)
            if raw is None:
                return CalibrationResultDTO(pose_camera_link=None)

        stack = [p for p in (raw.base_pose, raw.key_points_base_pose)
                 if p is not None]
        if not stack:
            return CalibrationResultDTO(pose_camera_link=None)
        avg = np.asarray(calib_util.average_poses(np.stack(stack)))
        calibration = CalibrationResultDTO(pose_camera_link=avg)
        calibration.load_from_test_result(raw)
        return calibration

    def _calibrate_individual(self, data, weights=None, confident_count=None
                              ) -> typing.Optional[TestResultDTO]:
        """Parity with _calibrate_individual (:196-244)."""
        confident_count = (confident_count
                           or self.cfg.calibration_confident_count)
        confident = [d for d in data if d is not None and d.is_confident]
        if len(confident) < confident_count:
            return None
        result = TestResultDTO(segmentation=None, is_confident=True)

        def avg(field):
            poses = [getattr(d, field) for d in confident
                     if getattr(d, field, None) is not None]
            if not poses:
                return None
            poses = calib_util.remove_pose_outliers(
                np.asarray(poses, np.float32))
            return np.asarray(calib_util.average_poses(poses, weights=weights))

        result.ee_pose = avg("ee_pose")
        result.base_pose = avg("base_pose")
        result.key_points_pose = avg("key_points_pose")
        result.key_points_base_pose = avg("key_points_base_pose")

        clt = self.cfg.camera_link_transformation_pose
        if clt is not None:
            def to_cl(field):
                poses = [np.asarray(transform_pose2pose(getattr(d, field), clt))
                         for d in confident
                         if getattr(d, field, None) is not None]
                if not poses:
                    return None
                return np.asarray(calib_util.average_poses(
                    np.asarray(poses, np.float32), weights=weights))

            result.base_pose_camera_link = to_cl("base_pose")
            result.key_points_base_pose_camera_link = to_cl(
                "key_points_base_pose")
        return result
