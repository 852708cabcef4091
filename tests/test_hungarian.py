"""On-device Hungarian vs scipy.optimize.linear_sum_assignment."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

import jax
import jax.numpy as jnp

from poet_tpu.ops.hungarian import hungarian


def _check_matches_scipy(cost):
    col_of_row = np.asarray(hungarian(jnp.asarray(cost)))
    ri, ci = linear_sum_assignment(cost)
    ours = cost[np.arange(cost.shape[0]), col_of_row].sum()
    theirs = cost[ri, ci].sum()
    # assignment must be a permutation
    assert sorted(col_of_row.tolist()) == list(range(cost.shape[0]))
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_small_known():
    cost = np.array([[4.0, 1, 3], [2, 0, 5], [3, 2, 2]], dtype=np.float32)
    _check_matches_scipy(cost)
    col = np.asarray(hungarian(jnp.asarray(cost)))
    np.testing.assert_array_equal(col, [1, 0, 2])


def test_random_many(rng):
    for n in [2, 3, 5, 10, 16, 33]:
        for _ in range(5):
            cost = rng.normal(size=(n, n)).astype(np.float32) * 10
            _check_matches_scipy(cost)


def test_batched(rng):
    costs = rng.uniform(size=(8, 10, 10)).astype(np.float32)
    cols = np.asarray(hungarian(jnp.asarray(costs)))
    for b in range(8):
        ri, ci = linear_sum_assignment(costs[b])
        ours = costs[b][np.arange(10), cols[b]].sum()
        np.testing.assert_allclose(ours, costs[b][ri, ci].sum(), rtol=1e-6)


def test_inside_jit_and_vmap(rng):
    costs = rng.uniform(size=(4, 6, 6)).astype(np.float32)
    fn = jax.jit(jax.vmap(hungarian))
    cols = np.asarray(fn(jnp.asarray(costs)))
    for b in range(4):
        ri, ci = linear_sum_assignment(costs[b])
        np.testing.assert_allclose(
            costs[b][np.arange(6), cols[b]].sum(), costs[b][ri, ci].sum(), rtol=1e-6
        )


def test_rectangular_via_padding(rng):
    """Padding a rectangular problem with a constant big cost preserves the
    real-entry optimum — the property the matcher relies on."""
    BIG = 1e6
    n_pred, n_tgt, n = 7, 4, 8
    cost = rng.normal(size=(n_pred, n_tgt)).astype(np.float32)
    padded = np.full((n, n), BIG, dtype=np.float32)
    padded[:n_pred, :n_tgt] = cost
    col_of_row = np.asarray(hungarian(jnp.asarray(padded)))
    ri, ci = linear_sum_assignment(cost)
    matched = {(i, col_of_row[i]) for i in range(n_pred) if col_of_row[i] < n_tgt}
    expected = set(zip(ri.tolist(), ci.tolist()))
    assert matched == expected
