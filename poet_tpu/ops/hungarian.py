"""On-device Hungarian assignment (Jonker–Volgenant with potentials).

TPU-native replacement for the reference's `scipy.optimize.linear_sum_assignment`
(C/LAPJV on host), which forces a device→host sync per batch per decoder layer
(models/matcher.py:196-202 — the single biggest structural perf bug in the
reference's hot loop). Here the solver runs INSIDE jit via `lax.while_loop` /
`lax.fori_loop`, is exact (shortest augmenting paths over a square cost
matrix), and vmaps over the batch. Problem sizes are tiny (n = num_queries,
typically 10-64), so the O(n³) scalar-ish loop is negligible next to the
transformer; what matters is never leaving the device.

Rectangular problems are handled by padding to square with a large constant
cost (see `poet_tpu.models.matcher`): padded entries cost the same wherever
they are matched, so the real-entry sub-assignment equals the rectangular LSA
optimum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_INF = jnp.float32(1e18)


def hungarian(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve min-cost perfect assignment on a square cost matrix.

    Args:
      cost: (..., n, n) float matrix (leading dims are vmapped).

    Returns:
      (..., n) int32 `col_of_row`: column assigned to each row. The assignment
      minimizes sum_i cost[i, col_of_row[i]].
    """
    if cost.ndim > 2:
        batch_shape = cost.shape[:-2]
        flat = cost.reshape((-1,) + cost.shape[-2:])
        out = jax.vmap(_hungarian_single)(flat)
        return out.reshape(batch_shape + (cost.shape[-1],))
    return _hungarian_single(cost)


def _hungarian_single(cost: jnp.ndarray) -> jnp.ndarray:
    n = cost.shape[-1]
    dtype = jnp.float32
    # 1-indexed working matrix with a virtual row/col 0.
    a = jnp.full((n + 1, n + 1), 0.0, dtype=dtype)
    a = a.at[1:, 1:].set(cost.astype(dtype))

    u0 = jnp.zeros(n + 1, dtype=dtype)
    v0 = jnp.zeros(n + 1, dtype=dtype)
    p0 = jnp.zeros(n + 1, dtype=jnp.int32)  # p[j]: row assigned to col j (0 = none)

    col_range = jnp.arange(n + 1)

    def assign_row(i1, carry):
        u, v, p = carry
        i = i1 + 1  # rows are 1-indexed
        p = p.at[0].set(i)

        minv = jnp.full(n + 1, _INF, dtype=dtype)
        used = jnp.zeros(n + 1, dtype=bool)
        way = jnp.zeros(n + 1, dtype=jnp.int32)
        j0 = jnp.int32(0)

        def path_cond(state):
            j0, _, _, _, u, v, p = state
            return p[j0] != 0

        def path_body(state):
            j0, minv, used, way, u, v, p = state
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = a[i0] - u[i0] - v                      # (n+1,)
            # Column 0 is virtual: exclude by treating it as used from the start
            # (used[0] is set on the first iteration since j0 starts at 0).
            better = (~used) & (cur < minv)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(used, _INF, minv)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # Update potentials along the tree, shrink tentative distances.
            u = u.at[p].add(jnp.where(used, delta, 0.0))
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            return j1, minv, used, way, u, v, p

        j0, minv, used, way, u, v, p = lax.while_loop(
            path_cond, path_body, (j0, minv, used, way, u, v, p)
        )

        # Augment: walk back along `way`, shifting assignments.
        def aug_cond(state):
            j0, _ = state
            return j0 != 0

        def aug_body(state):
            j0, p = state
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return j1, p

        _, p = lax.while_loop(aug_cond, aug_body, (j0, p))
        return u, v, p

    _, _, p = lax.fori_loop(0, n, assign_row, (u0, v0, p0))

    # p[j] = row for column j (1-indexed). Invert to col_of_row (0-indexed).
    rows = p[1:] - 1                                   # (n,) row index per col
    cols = col_range[1:] - 1                           # 0..n-1
    col_of_row = jnp.zeros(n, dtype=jnp.int32).at[rows].set(cols)
    return col_of_row
