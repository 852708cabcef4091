"""Pallas min-distance kernel (ADD-S nearest neighbor) vs numpy (interpret)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def _ref_min_d2(gt, est):
    d2 = ((gt[:, :, None, :] - est[:, None, :, :]) ** 2).sum(-1)
    return d2.min(-1)


@pytest.mark.parametrize("N,M", [(300, 300), (256, 2048), (513, 700)])
def test_min_dist_matches_numpy(rng, N, M):
    from poet_tpu.ops.nn_pallas import min_dist_sq_pallas

    gt = rng.normal(size=(3, N, 3)).astype(np.float32)
    est = rng.normal(size=(3, M, 3)).astype(np.float32)
    got = np.asarray(min_dist_sq_pallas(jnp.asarray(gt), jnp.asarray(est)))
    want = _ref_min_d2(gt, est)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_adi_errors_pallas_path_matches_default(rng, monkeypatch):
    from poet_tpu.evaluation import pose_evaluator as pe

    pts = rng.normal(size=(257, 3)).astype(np.float32)
    P = 5

    def rand_pose():
        a = rng.normal(size=(3, 3))
        q, r = np.linalg.qr(a)
        q *= np.sign(np.diagonal(r))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        return np.concatenate([q, rng.normal(size=(3, 1))], axis=1)

    pred = np.stack([rand_pose() for _ in range(P)])
    gt = np.stack([rand_pose() for _ in range(P)])
    base = pe.adi_errors(pts, pred, gt)
    monkeypatch.setenv("POET_ADI_PALLAS", "1")
    fast = pe.adi_errors(pts, pred, gt)
    np.testing.assert_allclose(base, fast, atol=1e-5, rtol=1e-4)
