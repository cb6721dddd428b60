"""Opt-in continuous 6D rotation head (ROADMAP #8 / VERDICT r2 #5).

Reference trains quaternion heads (loss.py:74); the 6D parameterization is
a TPU-side addition — these tests pin the conversion math and the training
loss plumbing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrcc_tpu.geometry.quaternion import qnormalize
from mrcc_tpu.geometry.transform import (matrix_to_quat, quat_to_matrix,
                                         rot6d_to_matrix, rot6d_to_quat)


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_rot6d_roundtrip(rng):
    """matrix -> first-two-columns 6D -> matrix is the identity map."""
    q = jnp.asarray(random_quats(rng, 32), jnp.float32)
    m = quat_to_matrix(q)
    r6 = jnp.concatenate([m[..., :, 0], m[..., :, 1]], axis=-1)
    m2 = rot6d_to_matrix(r6)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-5)
    # and the quaternion comes back up to sign
    q2 = rot6d_to_quat(r6)
    dot = np.abs(np.sum(np.asarray(qnormalize(q)) * np.asarray(q2), axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_rot6d_always_valid_rotation(rng):
    """Arbitrary (non-orthonormal) 6D vectors map to proper rotations."""
    r6 = jnp.asarray(rng.normal(size=(64, 6)) * 3, jnp.float32)
    m = np.asarray(rot6d_to_matrix(r6))
    eye = np.einsum("nij,nkj->nik", m, m)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)


def test_cos2_6d_loss_zero_at_truth(rng):
    from mrcc_tpu.train.losses import LossConfig, LossType, get_criterion

    q = jnp.asarray(random_quats(rng, 8), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    y = jnp.concatenate([pos, q], axis=-1)
    m = quat_to_matrix(q)
    r6 = jnp.concatenate([m[..., :, 0], m[..., :, 1]], axis=-1)
    y_pred = jnp.concatenate([pos, r6], axis=-1)

    crit = get_criterion(LossConfig(loss_type=LossType.COS2_6D))
    loss = float(crit(y, y_pred))
    assert loss < 1e-5
    # and a perturbed prediction costs more
    y_bad = y_pred.at[:, 3:9].add(0.3)
    assert float(crit(y, y_bad)) > loss + 1e-3


def test_cos2_6d_confidence_heads(rng):
    from mrcc_tpu.train.losses import LossConfig, LossType, get_criterion

    q = jnp.asarray(random_quats(rng, 8), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    y = jnp.concatenate([pos, q], axis=-1)
    m = quat_to_matrix(q)
    r6 = jnp.concatenate([m[..., :, 0], m[..., :, 1]], axis=-1)
    conf = jnp.full((8, 3), 0.99)
    y_pred = jnp.concatenate([pos, r6, conf], axis=-1)
    crit = get_criterion(LossConfig(loss_type=LossType.COS2_6D,
                                    compute_confidence=True))
    # perfect pose + confident heads: tiny BCE only
    assert float(crit(y, y_pred)) < 0.1
    # unconfident heads at a perfect pose are penalized
    y_unconf = jnp.concatenate([pos, r6, jnp.full((8, 3), 0.01)], axis=-1)
    assert float(crit(y, y_unconf)) > 1.0


@pytest.mark.slow
def test_rot6d_train_step_learns(rng):
    """One pose sample, a few steps: the 6D head's loss must drop."""
    from mrcc_tpu.data import DataConfig
    from mrcc_tpu.models import RobotNetEncode
    from mrcc_tpu.train import (LossConfig, LossType, TrainConfig,
                                make_pose_train_step)
    from mrcc_tpu.train.trainer import TrainState

    model = RobotNetEncode(backbone="minkunet14A", in_channels=3,
                           out_channels=12, rot_dims=6)
    dcfg = DataConfig(data_type="ee_seg", max_points=256, scale=50,
                      center_at_origin=True)
    tc = TrainConfig(lr=3e-3, batch_size=2, epochs=1)
    step, opt = make_pose_train_step(
        model, dcfg, LossConfig(loss_type=LossType.COS2_6D,
                                compute_confidence=True), tc,
        voxel_capacity=256)

    pts = jnp.asarray(rng.normal(size=(2, 256, 3)) * 0.2, jnp.float32)
    feats = jnp.asarray(rng.random((2, 256, 3)), jnp.float32)
    mask = jnp.ones((2, 256), bool)
    pose = jnp.asarray(np.concatenate(
        [rng.normal(size=(2, 3)) * 0.1, random_quats(rng, 2)], axis=-1),
        jnp.float32)
    batch = {"points": pts, "feats": feats, "mask": mask, "pose": pose}

    import jax as _jax
    variables = model.init(_jax.random.PRNGKey(0), feats,
                           _levels(pts, feats, mask))
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=opt.init(variables["params"]))
    losses = []
    for i in range(6):
        state, metrics = step(state, batch, jnp.asarray(3e-3))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def _levels(pts, feats, mask):
    from mrcc_tpu.sparse import build_hierarchy, voxelize

    vox, _, _ = voxelize(pts, feats, mask, 1 / 50.0, 256)
    return build_hierarchy(vox, 4, capacities=(128, 64, 64, 64))


def test_cos2_6d_symmetry_flip_loss(rng):
    """Symmetry-aware rotation term (r5): a prediction equal to the
    FLIPPED label (180° about body z) incurs ~zero rotation loss when
    symmetry_flip_axis='z', full loss without it; a genuinely-wrong
    rotation still pays under both."""
    from mrcc_tpu.geometry.quaternion import qmul
    from mrcc_tpu.train.losses import LossConfig, LossType, get_criterion

    n = 16
    q = jnp.asarray(random_quats(rng, n), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    y = jnp.concatenate([pos, q], axis=-1)

    flip_z = jnp.broadcast_to(jnp.asarray([0., 0., 0., 1.], jnp.float32),
                              q.shape)
    q_flip = qmul(q, flip_z)
    m = quat_to_matrix(q_flip)
    r6_flip = jnp.concatenate([m[..., :, 0], m[..., :, 1]], axis=-1)
    y_pred = jnp.concatenate([pos, r6_flip], axis=-1)

    plain = get_criterion(LossConfig(loss_type=LossType.COS2_6D))
    symm = get_criterion(LossConfig(loss_type=LossType.COS2_6D,
                                    symmetry_flip_axis="z"))
    assert float(symm(y, y_pred)) < 1e-3
    assert float(plain(y, y_pred)) > 0.5

    # exact label: both near zero
    m0 = quat_to_matrix(q)
    r6 = jnp.concatenate([m0[..., :, 0], m0[..., :, 1]], axis=-1)
    y_true = jnp.concatenate([pos, r6], axis=-1)
    assert float(symm(y, y_true)) < 1e-3
    assert float(plain(y, y_true)) < 1e-3

    # a 90° x-rotation away is wrong under BOTH branches
    qx90 = jnp.broadcast_to(
        jnp.asarray([np.cos(np.pi / 4), np.sin(np.pi / 4), 0., 0.],
                    jnp.float32), q.shape)
    mw = quat_to_matrix(qmul(q, qx90))
    r6w = jnp.concatenate([mw[..., :, 0], mw[..., :, 1]], axis=-1)
    y_wrong = jnp.concatenate([pos, r6w], axis=-1)
    assert float(symm(y, y_wrong)) > 0.2
