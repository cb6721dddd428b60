"""Losses, train steps (single + 8-device mesh), checkpointing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrcc_tpu.data import AliveV2Dataset, DataConfig, generate_sample
from mrcc_tpu.models import RobotNetEncode, RobotNetSegmentation
from mrcc_tpu.parallel import make_mesh, pad_batch_to, shard_batch
from mrcc_tpu.train import (
    LossConfig,
    LossType,
    TrainConfig,
    Trainer,
    get_criterion,
    make_pose_train_step,
    make_segmentation_train_step,
    segmentation_loss,
)
from mrcc_tpu.train.checkpoint import (
    checkpoint_restore,
    checkpoint_save,
    is_multiple,
    is_power2,
    latest_checkpoint,
)


def random_poses(rng, b):
    q = rng.normal(size=(b, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.concatenate([rng.normal(size=(b, 3)), q], -1).astype(np.float32)


class TestLosses:
    def test_zero_at_equality(self, rng):
        y = jnp.asarray(random_poses(rng, 4))
        coords = jnp.asarray(rng.normal(size=(4, 32, 3)).astype(np.float32))
        valid = jnp.ones((4, 32), bool)
        for lt in [LossType.MSE, LossType.COS2,
                   LossType.POSE, LossType.POSE_MATCH, LossType.SHAPE_MATCH,
                   LossType.KP_POSE_MATCH]:
            crit = get_criterion(LossConfig(loss_type=lt))
            loss = float(crit(y, y, coords=coords, coords_valid=valid))
            assert abs(loss) < 1e-3, (lt, loss)
        # the reference's "geodesic" term is acos((<q,q>-1)/2) = acos(0) =
        # pi/2 at equality (loss.py:132) — preserved faithfully
        for lt in [LossType.WGEODESIC, LossType.SMOOTHL1]:
            crit = get_criterion(LossConfig(loss_type=lt))
            loss = float(crit(y, y))
            np.testing.assert_allclose(loss, np.pi / 2, atol=1e-4)

    def test_positive_when_different(self, rng):
        y = jnp.asarray(random_poses(rng, 4))
        y2 = jnp.asarray(random_poses(rng, 4))
        coords = jnp.asarray(rng.normal(size=(4, 32, 3)).astype(np.float32))
        valid = jnp.ones((4, 32), bool)
        for lt in LossType:
            crit = get_criterion(LossConfig(loss_type=lt))
            loss = float(crit(y, y2, coords=coords, coords_valid=valid))
            assert loss > 0, lt

    def test_cos2_confidence_branch(self, rng):
        y = jnp.asarray(random_poses(rng, 8))
        pred = jnp.concatenate(
            [jnp.asarray(random_poses(rng, 8)),
             jnp.full((8, 3), 0.5, jnp.float32)], axis=-1)
        crit = get_criterion(LossConfig(loss_type=LossType.COS2,
                                        compute_confidence=True))
        loss = float(crit(y, pred))
        assert np.isfinite(loss) and loss > 0

    def test_segmentation_loss_ignores(self, rng):
        logits = jnp.asarray(rng.normal(size=(2, 16, 3)).astype(np.float32))
        labels = jnp.zeros((2, 16), jnp.int32).at[:, 8:].set(-100)
        valid = jnp.ones((2, 16), bool)
        l1 = float(segmentation_loss(logits, labels, valid))
        # garbage in ignored rows must not change the loss
        labels2 = labels.at[:, 8:].set(-100)
        logits2 = logits.at[:, 8:].set(99.0)
        l2 = float(segmentation_loss(logits2, labels2, valid))
        assert abs(l1 - l2) < 1e-6

    def test_masked_coords_invariance(self, rng):
        # pose loss with padded garbage coords behind the mask
        y = jnp.asarray(random_poses(rng, 2))
        y2 = jnp.asarray(random_poses(rng, 2))
        coords = rng.normal(size=(2, 32, 3)).astype(np.float32)
        valid = np.ones((2, 32), bool)
        valid[:, 20:] = False
        crit = get_criterion(LossConfig(loss_type=LossType.POSE))
        l1 = float(crit(y, y2, coords=jnp.asarray(coords),
                        coords_valid=jnp.asarray(valid)))
        coords2 = coords.copy()
        coords2[:, 20:] = 1e3
        l2 = float(crit(y, y2, coords=jnp.asarray(coords2),
                        coords_valid=jnp.asarray(valid)))
        assert abs(l1 - l2) < 1e-3


@pytest.fixture(scope="module")
def seg_setup():
    sample = generate_sample(seed=11, n_ee=800, n_arm=1200, n_bg=2000)
    cfg = DataConfig(data_type=None, max_points=4096, scale=200,
                     center_at_origin=True)
    ds = AliveV2Dataset(samples=[sample] * 4, cfg=cfg)
    model = RobotNetSegmentation(backbone="minkunet14A", in_channels=3,
                                 num_classes=3)
    return ds, model


@pytest.mark.slow
class TestTrainSteps:
    def test_segmentation_step_reduces_loss(self, seg_setup):
        ds, model = seg_setup
        tc = TrainConfig(lr=3e-3, batch_size=2)
        step, optimizer = make_segmentation_train_step(
            model, ds.cfg, tc, voxel_capacity=2048)
        trainer = Trainer(model, ds, step, optimizer, tc,
                          exp_path="/tmp/mrcc_test_exp", exp_name="segtest")
        batch = ds.collate([ds[0], ds[1]])
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "others"}
        state = trainer.state
        losses = []
        for i in range(5):
            state, m = step(state, batch, 3e-3)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()

    def test_pose_step_runs(self, seg_setup):
        ds, _ = seg_setup
        cfg = DataConfig(data_type="ee_seg", max_points=2048, scale=200,
                         center_at_origin=True)
        sample = generate_sample(seed=12, n_ee=800, n_arm=600, n_bg=600)
        ds_ee = AliveV2Dataset(samples=[sample] * 2, cfg=cfg)
        model = RobotNetEncode(backbone="minkunet14A", in_channels=3,
                               out_channels=7)
        tc = TrainConfig(lr=1e-3, batch_size=2)
        step, optimizer = make_pose_train_step(
            model, cfg, LossConfig(loss_type=LossType.COS2), tc,
            voxel_capacity=1024)
        trainer = Trainer(model, ds_ee, step, optimizer, tc,
                          exp_path="/tmp/mrcc_test_exp", exp_name="posetest")
        batch = ds_ee.collate([ds_ee[0], ds_ee[1]])
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "others"}
        state, m = step(trainer.state, batch, 1e-3)
        assert np.isfinite(float(m["loss"]))
        assert float(m["dist_position"]) >= 0

    def test_mesh_data_parallel_step(self, seg_setup):
        ds, model = seg_setup
        mesh = make_mesh(8)
        tc = TrainConfig(lr=1e-3, batch_size=8)
        step, optimizer = make_segmentation_train_step(
            model, ds.cfg, tc, voxel_capacity=1024)
        trainer = Trainer(model, ds, step, optimizer, tc,
                          exp_path="/tmp/mrcc_test_exp", exp_name="meshtest",
                          mesh=mesh)
        batch = ds.collate([ds[i % 4] for i in range(8)])
        batch = {k: v for k, v in batch.items() if k != "others"}
        batch = shard_batch(pad_batch_to(batch, 8), mesh)
        state, m = step(trainer.state, batch, 1e-3)
        assert np.isfinite(float(m["loss"]))

    def test_trainer_epoch_and_checkpoint(self, seg_setup, tmp_path):
        ds, model = seg_setup
        tc = TrainConfig(lr=1e-3, batch_size=2, epochs=2, save_freq=1)
        step, optimizer = make_segmentation_train_step(
            model, ds.cfg, tc, voxel_capacity=1024)
        trainer = Trainer(model, ds, step, optimizer, tc,
                          exp_path=str(tmp_path), exp_name="t")
        hist = trainer.fit(epochs=2)
        assert len(hist) == 2
        assert latest_checkpoint(str(tmp_path), "t") is not None
        # restore resumes at saved epoch
        trainer2 = Trainer(model, ds, step, optimizer, tc,
                           exp_path=str(tmp_path), exp_name="t")
        assert trainer2.state.epoch == 2


class TestCheckpoint:
    def test_retention(self, tmp_path, rng):
        state = {"w": np.arange(4.0)}
        for epoch in range(1, 8):
            checkpoint_save(state, str(tmp_path), "r", epoch, save_freq=4)
        import glob
        import os

        kept = sorted(int(os.path.basename(p).split("-")[1].split(".")[0])
                      for p in glob.glob(str(tmp_path / "r-*.ckpt")))
        # epochs 1,2,4 (pow2), 4 (mult of 4), 7 (latest); 3,5,6 pruned
        assert 7 in kept
        assert 3 not in kept and 5 not in kept and 6 not in kept
        assert {1, 2, 4} <= set(kept)

    def test_roundtrip(self, tmp_path, rng):
        state = {"w": rng.normal(size=(3, 3)).astype(np.float32), "b": 2}
        checkpoint_save(state, str(tmp_path), "x", 5)
        got, epoch = checkpoint_restore({"w": np.zeros((3, 3), np.float32),
                                         "b": 0}, str(tmp_path), "x")
        assert epoch == 5
        np.testing.assert_allclose(got["w"], state["w"])

    def test_helpers(self):
        assert is_power2(8) and not is_power2(6) and not is_power2(0)
        assert is_multiple(8, 4) and not is_multiple(6, 4)
