"""Loss-function parity tests against hand-computed numpy references."""

import numpy as np
from scipy.spatial.transform import Rotation as ScipyRot

import jax.numpy as jnp

from poet_tpu.models import criterion as crit
from poet_tpu.models.matcher import MatchResult


def _identity_match(B, Q, n_valid):
    idx = np.tile(np.arange(Q), (B, 1)).astype(np.int32)
    valid = np.arange(Q)[None, :] < np.asarray(n_valid)[:, None]
    return MatchResult(tgt_idx=jnp.asarray(idx), valid=jnp.asarray(valid))


def test_loss_translation_exact(rng):
    B, Q = 2, 4
    pred = rng.normal(size=(B, Q, 3)).astype(np.float32)
    tgt = rng.normal(size=(B, Q, 3)).astype(np.float32)
    n_valid = [4, 2]
    match = _identity_match(B, Q, n_valid)
    out = float(crit.loss_translation(jnp.asarray(pred), jnp.asarray(tgt), match))
    dists = np.linalg.norm(pred - tgt, axis=-1)
    expected = (dists[0, :4].sum() + dists[1, :2].sum()) / 6
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_loss_translation_permuted_match(rng):
    B, Q = 1, 3
    pred = rng.normal(size=(B, Q, 3)).astype(np.float32)
    tgt = rng.normal(size=(B, Q, 3)).astype(np.float32)
    perm = np.array([[2, 0, 1]], dtype=np.int32)
    match = MatchResult(tgt_idx=jnp.asarray(perm), valid=jnp.ones((1, 3), bool))
    out = float(crit.loss_translation(jnp.asarray(pred), jnp.asarray(tgt), match))
    expected = np.mean([np.linalg.norm(pred[0, i] - tgt[0, perm[0, i]]) for i in range(3)])
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_loss_rotation_exact():
    angles = np.array([0.3, 0.8])
    pred = np.stack(
        [ScipyRot.from_euler("z", a).as_matrix() for a in angles]
    ).astype(np.float32)[None]
    tgt = np.tile(np.eye(3, dtype=np.float32), (1, 2, 1, 1))
    match = _identity_match(1, 2, [2])
    out = float(crit.loss_rotation(jnp.asarray(pred), jnp.asarray(tgt), match))
    np.testing.assert_allclose(out, angles.mean(), atol=1e-4)


def test_loss_quaternion():
    q_pred = np.array([[[1.0, 0, 0, 0], [0.0, 1, 0, 0]]], dtype=np.float32)
    q_tgt = np.array([[[1.0, 0, 0, 0], [1.0, 0, 0, 0]]], dtype=np.float32)
    match = _identity_match(1, 2, [2])
    out = float(crit.loss_quaternion(jnp.asarray(q_pred), jnp.asarray(q_tgt), match))
    expected = (-np.log(1 + 1e-4) - np.log(0 + 1e-4)) / 2
    np.testing.assert_allclose(out, expected, rtol=1e-4)


def test_loss_silho_quaternion():
    q_pred = np.array([[[1.0, 0, 0, 0]]], dtype=np.float32)
    q_tgt = np.array([[[np.cos(0.2), np.sin(0.2), 0, 0]]], dtype=np.float32)
    match = _identity_match(1, 1, [1])
    out = float(crit.loss_silho_quaternion(jnp.asarray(q_pred), jnp.asarray(q_tgt), match))
    expected = np.log(1 - np.cos(0.2) + 1e-4)
    np.testing.assert_allclose(out, expected, rtol=1e-4)


def test_loss_translation_aleatoric(rng):
    B, Q = 1, 2
    pred = rng.normal(size=(B, Q, 3)).astype(np.float32)
    s = rng.normal(size=(B, Q, 3)).astype(np.float32)
    tgt = rng.normal(size=(B, Q, 3)).astype(np.float32)
    match = _identity_match(B, Q, [2])
    out = float(
        crit.loss_translation_aleatoric(jnp.asarray(pred), jnp.asarray(s), jnp.asarray(tgt), match)
    )
    diff = tgt - pred
    per = (np.exp(-s) * diff**2).sum(-1) + s.sum(-1)
    np.testing.assert_allclose(out, per.sum() / 4, rtol=1e-5)


def test_loss_rotation_aleatoric_identity():
    """Pred == tgt: residual log-map ~ 0, loss ~ s_sum / 2n."""
    R = ScipyRot.from_euler("x", 0.5).as_matrix().astype(np.float32)[None, None]
    s = np.full((1, 1, 3), 0.7, dtype=np.float32)
    match = _identity_match(1, 1, [1])
    out = float(crit.loss_rotation_aleatoric(jnp.asarray(R), jnp.asarray(s), jnp.asarray(R), match))
    np.testing.assert_allclose(out, 3 * 0.7 / 2, atol=1e-2)


def test_compute_losses_aux_naming(rng):
    n_layers, B, Q = 3, 2, 4
    outputs = {
        "translations": jnp.asarray(rng.normal(size=(n_layers, B, Q, 3)).astype(np.float32)),
        "rotations": jnp.asarray(
            ScipyRot.random(n_layers * B * Q, random_state=1).as_matrix().reshape(
                n_layers, B, Q, 3, 3
            ).astype(np.float32)
        ),
    }
    targets = {
        "relative_position": jnp.asarray(rng.normal(size=(B, Q, 3)).astype(np.float32)),
        "relative_rotation": jnp.asarray(
            ScipyRot.random(B * Q, random_state=2).as_matrix().reshape(B, Q, 3, 3).astype(np.float32)
        ),
    }
    match = _identity_match(B, Q, [4, 3])
    losses = crit.compute_losses(outputs, targets, match)
    assert set(losses) == {
        "loss_trans", "loss_rot", "loss_trans_0", "loss_rot_0", "loss_trans_1", "loss_rot_1",
    }
    total = float(crit.weighted_total(losses, 2.0, 3.0))
    expected = sum(2.0 * float(v) for k, v in losses.items() if k.startswith("loss_trans"))
    expected += sum(3.0 * float(v) for k, v in losses.items() if k.startswith("loss_rot"))
    np.testing.assert_allclose(total, expected, rtol=1e-6)


def test_zero_matches_is_finite():
    match = MatchResult(
        tgt_idx=jnp.zeros((1, 3), jnp.int32), valid=jnp.zeros((1, 3), bool)
    )
    out = float(
        crit.loss_translation(jnp.ones((1, 3, 3)), jnp.zeros((1, 3, 3)), match)
    )
    assert np.isfinite(out) and out == 0.0
