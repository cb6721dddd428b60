"""Trainer entry mains — one per reference train_*.py script.

Each main mirrors its reference counterpart's model/loss/data selection
(SURVEY.md §2.2 L4 table) on the TPU stack, including the crash-retry
wrapper (train.py:377-389).  Invoked by the thin root-level scripts.
"""

from __future__ import annotations

import time
import traceback

import numpy as np

from ..config import Config
from ..data.dataset import DataConfig
from ..train import (
    LossConfig,
    Trainer,
    make_pose_train_step,
    make_segmentation_train_step,
)
from ..utils.logger import get_logger
from .common import ensure_dataset, exp_name_of, make_datasets, select_pose_model

VOXEL_CAPACITY = 16384
EE_VOXEL_CAPACITY = 4096


def _next_pow2(n):
    p = 64
    while p < n:
        p *= 2
    return p


def _scene_capacity(data_cfg):
    return min(VOXEL_CAPACITY, _next_pow2(data_cfg.max_points))


def _ee_capacity(data_cfg):
    return min(EE_VOXEL_CAPACITY, _next_pow2(data_cfg.max_points))


def _retry(main_fn, cfg, retries=3):
    """Crash-retry wrapper (train.py:377: ``while True`` + sleep)."""
    log = get_logger()
    for attempt in range(retries):
        try:
            return main_fn(cfg)
        except KeyboardInterrupt:
            raise
        except Exception:
            log.error(f"training crashed (attempt {attempt + 1}):\n"
                      f"{traceback.format_exc()}")
            time.sleep(2)
    raise RuntimeError("training failed after retries")


def train_pose(cfg: Config = None, epochs=None):
    """train.py parity: RobotNet(Encode)/PointNet2 pose regression, cos2."""
    cfg = cfg or Config.from_args()

    def main(cfg):
        model, _ = select_pose_model(cfg)
        data_cfg = cfg.data_config()
        train_cfg = cfg.train_config()
        ds_train, ds_val = make_datasets(cfg, data_cfg)
        cap = (_ee_capacity(data_cfg) if data_cfg.data_type == "ee_seg"
               else _scene_capacity(data_cfg))
        step, opt = make_pose_train_step(
            model, data_cfg, cfg.loss_config(), train_cfg, cap,
            use_joint_angles=cfg()["STRUCTURE"].get("use_joint_angles",
                                                    False))
        trainer = Trainer(model, ds_train, step, opt, train_cfg,
                          exp_path=cfg.exp_path, exp_name=exp_name_of(cfg),
                          val_dataset=ds_val)
        return trainer.fit(epochs=epochs)

    return _retry(main, cfg)


def train_segmentation(cfg: Config = None, epochs=None):
    """train_segmentation.py parity: RobotNetSegmentation + CE."""
    cfg = cfg or Config.from_args()

    def main(cfg):
        from ..models import RobotNetSegmentation

        d = cfg()["DATA"]
        model = RobotNetSegmentation(
            backbone=cfg()["STRUCTURE"].get("backbone", "minkunet"),
            in_channels=d.get("input_channel", 3),
            num_classes=d.get("classes", 3))
        data_cfg = cfg.data_config()
        # segmentation trains on full scenes
        data_cfg.data_type = None
        train_cfg = cfg.train_config()
        ds_train, ds_val = make_datasets(cfg, data_cfg)
        step, opt = make_segmentation_train_step(
            model, data_cfg, train_cfg, _scene_capacity(data_cfg),
            ignore_label=data_cfg.ignore_label)
        trainer = Trainer(model, ds_train, step, opt, train_cfg,
                          exp_path=cfg.exp_path, exp_name=exp_name_of(cfg),
                          val_dataset=ds_val)
        return trainer.fit(epochs=epochs)

    return _retry(main, cfg)


def train_vote(cfg: Config = None, epochs=None):
    """train_vote.py parity: RobotNetVote + CE on cross-section labels."""
    cfg = cfg or Config.from_args()

    def main(cfg):
        from ..models import RobotNetVote

        d = cfg()["DATA"]
        data_cfg = cfg.data_config()
        data_cfg.voting_enabled = True
        num_classes = 2 if data_cfg.data_type == "ee_seg" else 4
        model = RobotNetVote(
            backbone=cfg()["STRUCTURE"].get("backbone", "minkunet"),
            in_channels=d.get("input_channel", 3), num_classes=num_classes)
        train_cfg = cfg.train_config()
        ds_train, ds_val = make_datasets(cfg, data_cfg)
        step, opt = make_segmentation_train_step(
            model, data_cfg, train_cfg, _ee_capacity(data_cfg),
            ignore_label=data_cfg.ignore_label)
        trainer = Trainer(model, ds_train, step, opt, train_cfg,
                          exp_path=cfg.exp_path, exp_name=exp_name_of(cfg),
                          val_dataset=ds_val)
        return trainer.fit(epochs=epochs)

    return _retry(main, cfg)


def train_key_points(cfg: Config = None, epochs=None):
    """train_key_points.py parity: PointNet2SSG (dense) or
    RobotNetSegmentation with num_classes=#keypoints (sparse), CE labels."""
    cfg = cfg or Config.from_args()

    def main(cfg):
        d = cfg()["DATA"]
        s = cfg()["STRUCTURE"]
        data_cfg = cfg.data_config()
        data_cfg.keypoints_enabled = True
        data_cfg.data_type = "ee_seg"
        train_cfg = cfg.train_config()
        backbone = s.get("backbone", "minkunet")

        if backbone.startswith("pointnet"):
            return _train_key_points_dense(cfg, data_cfg, train_cfg, epochs)

        from ..models import RobotNetSegmentation

        model = RobotNetSegmentation(
            backbone=backbone, in_channels=d.get("input_channel", 3),
            num_classes=data_cfg.num_of_keypoints)
        ds_train, ds_val = make_datasets(cfg, data_cfg)
        step, opt = make_segmentation_train_step(
            model, data_cfg, train_cfg, _ee_capacity(data_cfg),
            ignore_label=data_cfg.ignore_label)
        trainer = Trainer(model, ds_train, step, opt, train_cfg,
                          exp_path=cfg.exp_path, exp_name=exp_name_of(cfg),
                          val_dataset=ds_val)
        return trainer.fit(epochs=epochs)

    return _retry(main, cfg)


def _train_key_points_dense(cfg, data_cfg, train_cfg, epochs):
    """Dense PointNet2 keypoint training (train_key_points.py dense path)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.pointnet2 import PointNet2SSG
    from ..train.losses import segmentation_loss
    from ..train.trainer import TrainState, make_optimizer

    n_pts = cfg()["DATA"].get("num_of_dense_input_points", 2048)
    ds_train, ds_val = make_datasets(cfg, data_cfg, dense=True)
    model = PointNet2SSG(num_classes=data_cfg.num_of_keypoints)
    optimizer = make_optimizer(train_cfg)

    sample = None
    for i in range(len(ds_train)):
        sample = ds_train[i]
        if sample is not None:
            break
    assert sample is not None, "no dense-eligible samples"
    batch0 = ds_train.collate([sample])
    x0 = jnp.concatenate([jnp.asarray(batch0["points"]),
                          jnp.asarray(batch0["feats"])], axis=-1)
    variables = jax.jit(
        lambda k, x: model.init({"params": k}, x))(
            jax.random.PRNGKey(train_cfg.seed), x0)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=optimizer.init(variables["params"]))
    exp_name = exp_name_of(cfg)

    @jax.jit
    def step(state, batch, lr):
        x = jnp.concatenate([batch["points"], batch["feats"]], axis=-1)

        def loss_fn(params):
            (logits, _), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats}, x,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)})
            loss = segmentation_loss(logits, batch["labels"], batch["mask"],
                                     ignore_label=data_cfg.ignore_label)
            return loss, updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        opt_state = optax.tree_utils.tree_set(state.opt_state,
                                              learning_rate=lr)
        upd, opt_state = optimizer.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, upd)
        return state.replace(params=params,
                             batch_stats=updates["batch_stats"],
                             opt_state=opt_state), {"loss": loss}

    trainer = Trainer(model, ds_train, step, optimizer, train_cfg,
                      exp_path=cfg.exp_path, exp_name=exp_name, state=state)
    return trainer.fit(epochs=epochs)


def train_kp_to_pose(cfg: Config = None, epochs=None):
    """train_kp_to_pose.py parity: frozen keypoint predictor -> gather kp
    coords + probabilities -> PointNet -> 7-DoF, kp_pose_match loss."""
    cfg = cfg or Config.from_args()

    def main(cfg):
        import jax
        import jax.numpy as jnp
        import optax

        from ..models.pointnet2 import PointNet, PointNet2SSG
        from ..solve import key_point_predictions
        from ..train.losses import LossConfig, LossType, get_criterion
        from ..train.trainer import TrainState, make_optimizer
        from ..train import checkpoint as ckpt

        data_cfg = cfg.data_config()
        data_cfg.keypoints_enabled = True
        data_cfg.data_type = "ee_seg"
        train_cfg = cfg.train_config()
        k = data_cfg.num_of_keypoints
        use_probs = cfg()["TRAIN"].get("kp_use_probabilities", True)

        ds_train, _ = make_datasets(cfg, data_cfg, dense=True)

        kp_model = PointNet2SSG(num_classes=k)
        pose_model = PointNet(out_channels=7)
        criterion = get_criterion(LossConfig(loss_type=LossType.KP_POSE_MATCH))
        optimizer = make_optimizer(train_cfg)

        sample = next((ds_train[i] for i in range(len(ds_train))
                       if ds_train[i] is not None), None)
        assert sample is not None
        batch0 = ds_train.collate([sample])
        x0 = jnp.concatenate([jnp.asarray(batch0["points"]),
                              jnp.asarray(batch0["feats"])], axis=-1)
        kp_vars = jax.jit(
            lambda k, x: kp_model.init({"params": k}, x))(
                jax.random.PRNGKey(0), x0)
        # frozen predictor: load from TRAIN.kp_prediction_checkpoint if given
        kp_ckpt = cfg()["TRAIN"].get("kp_prediction_checkpoint")
        if kp_ckpt:
            kp_vars, _ = ckpt.checkpoint_restore(kp_vars, "", "", f=kp_ckpt)

        in0 = jnp.zeros((1, k, 4 if use_probs else 3), jnp.float32)
        pose_vars = jax.jit(pose_model.init)(jax.random.PRNGKey(1), in0)
        state = TrainState(params=pose_vars["params"],
                           batch_stats=pose_vars["batch_stats"],
                           opt_state=optimizer.init(pose_vars["params"]))
        exp_name = exp_name_of(cfg)

        @jax.jit
        def step(state, batch, lr):
            x = jnp.concatenate([batch["points"], batch["feats"]], axis=-1)
            (kp_logits, _) = kp_model.apply(kp_vars, x, train=False)
            kp_idx, kp_found, kp_conf = jax.vmap(key_point_predictions)(
                kp_logits, batch["mask"])
            kp_coords = jnp.take_along_axis(batch["points"],
                                            kp_idx[..., None], axis=1)
            feats_in = kp_coords
            if use_probs:
                feats_in = jnp.concatenate(
                    [kp_coords, kp_conf[..., None]], axis=-1)

            def loss_fn(params):
                out, updates = pose_model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    feats_in, train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(0)})
                loss = criterion(batch["pose"], out, coords=kp_coords,
                                 coords_valid=kp_found,
                                 probs=kp_conf if use_probs else None)
                return loss, updates

            (loss, updates), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            opt_state = optax.tree_utils.tree_set(state.opt_state,
                                                  learning_rate=lr)
            upd, opt_state = optimizer.update(grads, opt_state, state.params)
            params = optax.apply_updates(state.params, upd)
            return state.replace(params=params,
                                 batch_stats=updates["batch_stats"],
                                 opt_state=opt_state), {"loss": loss}

        trainer = Trainer(pose_model, ds_train, step, optimizer, train_cfg,
                          exp_path=cfg.exp_path, exp_name=exp_name,
                          state=state)
        return trainer.fit(epochs=epochs)

    return _retry(main, cfg)


def train_feature_extractor(cfg: Config = None, epochs=None):
    """train_feature-extractor.py parity: FeatureNet + triplet/miner on YCB.

    The reference forgets optimizer.zero_grad() (SURVEY.md §2.3) — a bug
    that cannot exist in the functional optax formulation."""
    cfg = cfg or Config.from_args()

    def main(cfg):
        import jax
        import jax.numpy as jnp
        import optax

        from ..data.ycb import YCBDataset
        from ..models.featurenet import FeatureNet
        from ..sparse import build_hierarchy, voxelize
        from ..train.metric_learning import triplet_margin_loss
        from ..train.trainer import TrainState, make_optimizer
        from ..train import checkpoint as ckpt

        train_cfg = cfg.train_config()
        ds = YCBDataset(num_classes=8, samples_per_class=6, max_points=1024)
        model = FeatureNet(in_channels=3, out_channels=16,
                           backbone="minkunet34A")
        optimizer = make_optimizer(train_cfg)
        cap = 1024
        caps = (cap, cap // 2, cap // 4, cap // 8)

        b0 = ds.collate([ds[0]])
        vox0, _, _ = voxelize(jnp.asarray(b0["points"]),
                              jnp.asarray(b0["feats"]),
                              jnp.asarray(b0["mask"]), 1 / 200.0, cap)
        lv0 = build_hierarchy(vox0, 4, capacities=caps)
        variables = jax.jit(model.init)(jax.random.PRNGKey(train_cfg.seed),
                                        vox0.feats, lv0)
        state = TrainState(params=variables["params"],
                           batch_stats=variables["batch_stats"],
                           opt_state=optimizer.init(variables["params"]))
        exp_name = exp_name_of(cfg)

        @jax.jit
        def step(state, batch, lr):
            vox, _, _ = voxelize(batch["points"], batch["feats"],
                                 batch["mask"], 1 / 200.0, cap)
            levels = build_hierarchy(vox, 4, capacities=caps)

            def loss_fn(params):
                emb, updates = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    vox.feats, levels, train=True, mutable=["batch_stats"])
                return triplet_margin_loss(emb, batch["labels"]), updates

            (loss, updates), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            opt_state = optax.tree_utils.tree_set(state.opt_state,
                                                  learning_rate=lr)
            upd, opt_state = optimizer.update(grads, opt_state, state.params)
            params = optax.apply_updates(state.params, upd)
            return state.replace(params=params,
                                 batch_stats=updates["batch_stats"],
                                 opt_state=opt_state), {"loss": loss}

        import dataclasses

        # the reference trains metric learning with larger batches (pair
        # mining needs in-batch positives)
        train_cfg = dataclasses.replace(
            train_cfg, batch_size=max(train_cfg.batch_size, 8))
        trainer = Trainer(model, ds, step, optimizer, train_cfg,
                          exp_path=cfg.exp_path, exp_name=exp_name,
                          state=state)
        return trainer.fit(epochs=epochs)

    return _retry(main, cfg)
