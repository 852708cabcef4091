"""Native C++ LAPJV vs scipy and vs the on-device solver."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from poet_tpu.native import lapjv


def test_lapjv_matches_scipy(rng):
    for n in (2, 5, 10, 33, 64):
        cost = rng.normal(size=(n, n)) * 10
        col = lapjv(cost)
        ri, ci = linear_sum_assignment(cost)
        assert sorted(col.tolist()) == list(range(n))
        np.testing.assert_allclose(
            cost[np.arange(n), col].sum(), cost[ri, ci].sum(), rtol=1e-12
        )


def test_lapjv_batch(rng):
    costs = rng.uniform(size=(6, 12, 12))
    cols = lapjv(costs)
    for b in range(6):
        ri, ci = linear_sum_assignment(costs[b])
        np.testing.assert_allclose(
            costs[b][np.arange(12), cols[b]].sum(), costs[b][ri, ci].sum(), rtol=1e-12
        )


def test_lapjv_matches_device_solver(rng):
    """C++ host solver and the in-jit JV must agree on the optimum."""
    import jax.numpy as jnp
    from poet_tpu.ops.hungarian import hungarian

    cost = rng.normal(size=(4, 10, 10)).astype(np.float32)
    host = lapjv(cost.astype(np.float64))
    dev = np.asarray(hungarian(jnp.asarray(cost)))
    for b in range(4):
        h = cost[b][np.arange(10), host[b]].sum()
        d = cost[b][np.arange(10), dev[b]].sum()
        np.testing.assert_allclose(h, d, rtol=1e-5)
