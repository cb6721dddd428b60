"""Generic optax trainer shared by all task heads.

Parity with the train_*.py skeleton (SURVEY.md §2.2 L4): config -> seed ->
model -> criterion -> optimizer -> dataset -> checkpoint_restore -> epoch
loop with step-decayed lr, AverageMeter timing, periodic checkpoint save +
eval — but TPU-first: the whole step (voxelize -> hierarchy -> model ->
loss -> grad -> update) is ONE jit program, optionally data-parallel over a
device mesh (batch axis sharded, params replicated; XLA inserts the psum).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Callable, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..geometry.metrics import compute_pose_dist
from ..parallel import mesh as mesh_lib
from ..sparse import build_hierarchy, voxelize
from ..sparse.impl import sparse_impl
from . import checkpoint as ckpt
from .losses import LossConfig, LossType, get_criterion, segmentation_loss


@dataclasses.dataclass
class TrainConfig:
    """TRAIN config section (config/default.yaml:89-104)."""

    epochs: int = 1300
    lr: float = 1e-4
    optim: str = "Adam"           # Adam | SGD
    momentum: float = 0.8
    weight_decay: float = 1e-4
    multiplier: float = 0.8
    step_epoch: int = 16
    save_freq: int = 4
    batch_size: int = 2
    seed: int = 1
    # sparse-conv implementation for the train step, same semantics as
    # InferenceConfig.conv_impl: 'auto' = Pallas windowed gather-GEMM
    # kernels (fwd + custom VJP, ops/conv_pallas.py) on TPU, XLA gathers
    # elsewhere.  The reference's main workload is the training hot loop
    # (train.py:39-151) — it must run the kernel path, not only inference.
    conv_impl: str = "auto"
    # self-keyed k3 convs for the train step (r5): no per-step k3 table
    # builds — the sk custom VJP (pallas_conv_sk_op) carries the backward
    # through the negated-delta symmetry.  Gated per level by
    # hierarchy._use_self_keyed; non-Pallas impls ignore it.
    k3_self_keyed: bool = True


def resolve_conv_impl(name: str) -> str:
    """'auto' -> the kernel path on TPU, the XLA formulation elsewhere
    (same rule as InferenceEngine).  int8 is inference-only: quantized
    gathers are not differentiable."""
    if name == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    if name == "pallas-int8":
        raise ValueError("pallas-int8 is inference-only; training needs a "
                         "differentiable conv impl (auto|pallas|xla)")
    return name


@flax.struct.dataclass
class TrainState:
    params: dict
    batch_stats: dict
    opt_state: optax.OptState
    epoch: int = 0


def step_learning_rate(base_lr, epoch, step_epoch, multiplier):
    """lr decayed by ``multiplier`` every ``step_epoch`` epochs
    (utils/utils.py:36 ``step_learning_rate``)."""
    return base_lr * (multiplier ** (epoch // step_epoch))


def make_optimizer(cfg: TrainConfig):
    """Adam/SGD with the reference's hyperparameters; lr is injected per
    epoch via optax.inject_hyperparams."""
    if cfg.optim.lower() == "sgd":
        base = optax.inject_hyperparams(optax.sgd)(
            learning_rate=cfg.lr, momentum=cfg.momentum)
    else:
        base = optax.inject_hyperparams(
            partial(optax.adamw, weight_decay=cfg.weight_decay))(
                learning_rate=cfg.lr)
    return base


class AverageMeter:
    """utils/utils.py:17 parity."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = self.avg = self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class MetricsWriter:
    """Minimal tensorboard-style scalar writer -> JSONL
    (replaces tensorboardX SummaryWriter, train.py:29)."""

    def __init__(self, exp_path):
        import os

        os.makedirs(exp_path, exist_ok=True)
        self._f = open(f"{exp_path}/scalars.jsonl", "a")

    def add_scalar(self, tag, value, step):
        import json

        self._f.write(json.dumps({"tag": tag, "value": float(value),
                                  "step": int(step)}) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


# ------------------------------------------------------------------ steps


def make_pose_train_step(model, data_cfg, loss_cfg: LossConfig,
                         train_cfg: TrainConfig, voxel_capacity: int,
                         use_joint_angles: bool = False):
    """Jitted pose-regression train step (train.py:39-151 hot loop)."""
    criterion = get_criterion(loss_cfg)
    optimizer = make_optimizer(train_cfg)
    qsize = data_cfg.quantization_size
    caps = (voxel_capacity, max(voxel_capacity // 2, 64),
            max(voxel_capacity // 4, 64), max(voxel_capacity // 8, 64))
    impl = resolve_conv_impl(train_cfg.conv_impl)

    def step(state: TrainState, batch, lr):
      # impl is consulted at TRACE time (jit caches the traced graph), so
      # the context must wrap the whole step body — fwd AND the grad trace
      with sparse_impl(impl):
        vox, _, _ = voxelize(batch["points"], batch["feats"], batch["mask"],
                             qsize, voxel_capacity)
        levels = build_hierarchy(vox, 4, capacities=caps,
                                 k3_self_keyed=train_cfg.k3_self_keyed)
        coords = vox.coords().astype(jnp.float32)
        ja = batch.get("joint_angles") if use_joint_angles else None

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                vox.feats, levels, ja, train=True, mutable=["batch_stats"])
            loss = criterion(batch["pose"], out, coords=coords,
                             coords_valid=vox.valid)
            return loss, (out, updates)

        (loss, (out, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        opt_state = _set_lr(state.opt_state, lr)
        upd, opt_state = optimizer.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, upd)
        if loss_cfg.loss_type == LossType.COS2_6D:
            from ..geometry.transform import rot6d_to_quat

            out7 = jnp.concatenate(
                [out[:, :3], rot6d_to_quat(out[:, 3:9])], axis=-1)
        else:
            out7 = out[:, :7]
        dist, dist_pos, dist_ori, angle = compute_pose_dist(
            batch["pose"], out7)
        metrics = {"loss": loss, "dist": dist.mean(),
                   "dist_position": dist_pos.mean(),
                   "dist_orientation": dist_ori.mean(),
                   "angle_diff": angle.mean()}
        new_state = state.replace(params=params,
                                  batch_stats=updates["batch_stats"],
                                  opt_state=opt_state)
        return new_state, metrics

    return jax.jit(step), optimizer


def make_segmentation_train_step(model, data_cfg, train_cfg: TrainConfig,
                                 voxel_capacity: int, ignore_label=-100):
    """Jitted per-voxel CE train step (train_segmentation.py /
    train_vote.py / sparse train_key_points.py)."""
    optimizer = make_optimizer(train_cfg)
    qsize = data_cfg.quantization_size
    caps = (voxel_capacity, max(voxel_capacity // 2, 64),
            max(voxel_capacity // 4, 64), max(voxel_capacity // 8, 64))
    impl = resolve_conv_impl(train_cfg.conv_impl)

    def step(state: TrainState, batch, lr):
      # trace-time impl selection — see make_pose_train_step
      with sparse_impl(impl):
        vox, _, vlabels = voxelize(
            batch["points"], batch["feats"], batch["mask"], qsize,
            voxel_capacity, labels=batch["labels"],
            ignore_label=ignore_label)
        levels = build_hierarchy(vox, 4, capacities=caps,
                                 k3_self_keyed=train_cfg.k3_self_keyed)

        def loss_fn(params):
            logits, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                vox.feats, levels, train=True, mutable=["batch_stats"])
            loss = segmentation_loss(logits, vlabels, vox.valid,
                                     ignore_label=ignore_label)
            return loss, (logits, updates)

        (loss, (logits, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        opt_state = _set_lr(state.opt_state, lr)
        upd, opt_state = optimizer.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, upd)

        keep = vox.valid & (vlabels != ignore_label)
        pred = jnp.argmax(logits, axis=-1)
        acc = (jnp.where(keep, pred == vlabels, False).sum()
               / jnp.maximum(keep.sum(), 1))
        metrics = {"loss": loss, "accuracy": acc}
        new_state = state.replace(params=params,
                                  batch_stats=updates["batch_stats"],
                                  opt_state=opt_state)
        return new_state, metrics

    return jax.jit(step), optimizer


def _set_lr(opt_state, lr):
    """Override the injected learning rate inside the optax state."""
    return optax.tree_utils.tree_set(opt_state, learning_rate=lr)


# ------------------------------------------------------------------ driver


class Trainer:
    """Epoch-loop driver (train.py:236-374 skeleton)."""

    def __init__(self, model, dataset, step_fn, optimizer,
                 train_cfg: TrainConfig, exp_path="exp/default",
                 exp_name="default", val_dataset=None, mesh=None,
                 init_batch=None, state=None):
        """``state``: a pre-built TrainState for models whose init does not
        fit the standard voxelize-path (dense PointNet2, two-model
        pipelines, metric learning).  Checkpoint restore still applies —
        only the *construction* of the initial state is custom; the epoch
        loop, lr schedule, metrics and retention are shared."""
        self.model = model
        self.dataset = dataset
        self.val_dataset = val_dataset
        self.step_fn = step_fn
        self.optimizer = optimizer
        self.cfg = train_cfg
        self.exp_path = exp_path
        self.exp_name = exp_name
        self.mesh = mesh
        self.writer = MetricsWriter(exp_path)
        self.state = (self._restore(state) if state is not None
                      else self._init_state(init_batch))

    def _restore(self, state):
        state, epoch = ckpt.checkpoint_restore(state, self.exp_path,
                                               self.exp_name)
        return state.replace(epoch=epoch)

    def _init_state(self, batch):
        if batch is None:
            batch = self.dataset.collate([self.dataset[0]])
        qsize = self.dataset.cfg.quantization_size

        @jax.jit
        def init_fn(key, points, feats, mask):
            vox, _, _ = voxelize(points, feats, mask, qsize, 512)
            levels = build_hierarchy(vox, 4, capacities=(256, 128, 64, 64))
            return self.model.init(key, vox.feats, levels)

        variables = init_fn(jax.random.PRNGKey(self.cfg.seed),
                            jnp.asarray(batch["points"][:1]),
                            jnp.asarray(batch["feats"][:1]),
                            jnp.asarray(batch["mask"][:1]))
        opt_state = self.optimizer.init(variables["params"])
        state = TrainState(params=variables["params"],
                           batch_stats=variables.get("batch_stats", {}),
                           opt_state=opt_state)
        state, epoch = ckpt.checkpoint_restore(state, self.exp_path,
                                               self.exp_name)
        return state.replace(epoch=epoch)

    def train_epoch(self, epoch, log_every=10):
        iter_time = AverageMeter()
        data_time = AverageMeter()
        loss_meter = AverageMeter()
        lr = step_learning_rate(self.cfg.lr, epoch, self.cfg.step_epoch,
                                self.cfg.multiplier)
        end = time.time()
        n_batches = 0
        for batch in self.dataset.batches(self.cfg.batch_size, shuffle=True,
                                          seed=self.cfg.seed + epoch):
            data_time.update(time.time() - end)
            batch = {k: v for k, v in batch.items() if k != "others"}
            if self.mesh is not None:
                total = ((batch["points"].shape[0] + len(self.mesh.devices) - 1)
                         // len(self.mesh.devices)) * len(self.mesh.devices)
                batch = mesh_lib.pad_batch_to(batch, total)
                batch = mesh_lib.shard_batch(batch, self.mesh)
            self.state, metrics = self.step_fn(self.state, batch, lr)
            # keep the metrics ON DEVICE: float() here would force a host
            # round-trip per step (~ms each on the tunneled runtime),
            # serializing the epoch.  One sync at epoch end instead.
            metrics_dev = ({k: metrics[k] + metrics_dev[k] for k in metrics}
                           if n_batches else dict(metrics))
            iter_time.update(time.time() - end)
            end = time.time()
            n_batches += 1
        epoch_metrics = {}
        if n_batches:
            epoch_metrics = {k: float(v) / n_batches
                             for k, v in metrics_dev.items()}
            loss_meter.update(epoch_metrics["loss"])
        for k, v in epoch_metrics.items():
            self.writer.add_scalar(f"{k}_train", v, epoch)
        return {**epoch_metrics, "loss": loss_meter.avg,
                "iter_time": iter_time.avg,
                "data_time": data_time.avg, "lr": lr, "batches": n_batches}

    def fit(self, epochs=None, save=True):
        epochs = epochs or self.cfg.epochs
        start = self.state.epoch + 1
        history = []
        for epoch in range(start, epochs + 1):
            stats = self.train_epoch(epoch)
            self.state = self.state.replace(epoch=epoch)
            # the reference saves at save_freq multiples / powers of two
            # (utils/utils.py:62-126); we ALSO save the final epoch, so a
            # restore always resumes the exact state fit() returned (an
            # unsaved final epoch silently retrains its tail on restart)
            if save and (ckpt.is_multiple(epoch, self.cfg.save_freq)
                         or ckpt.is_power2(epoch) or epoch == epochs):
                ckpt.checkpoint_save(self.state, self.exp_path, self.exp_name,
                                     epoch, save_freq=self.cfg.save_freq)
            history.append(stats)
        return history
