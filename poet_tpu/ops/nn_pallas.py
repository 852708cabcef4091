"""Pallas nearest-neighbor (min squared distance) kernel for ADD-S metrics.

TPU-native replacement for scipy cKDTree (N6 in SURVEY §2.2; reference use:
evaluation_tools/pose_evaluator.py:714-739): for every ground-truth model
point, the distance to the closest predicted-cloud point.

The pure-XLA formulation in `evaluation/pose_evaluator.py:adi_errors` is an
MXU einsum producing the full (P, N, N) distance matrix — at BOP cloud sizes
(N up to ~15k points) that is gigabytes of HBM write+read per pose chunk,
because XLA cannot fuse the min-reduction into the dot output (reduction
fusion does not cross a dot boundary — the same wall the deformable-sampling
kernel hit, see ops/deform_attn_pallas_v3.py). This kernel computes the
cross-term tile by tile in VMEM and only ever writes the (P, N) running
minimum to HBM.

Layout: gt points live in LANES (the output is a (1, G) row per program, so
the chunk-min is a free sublane reduction); est points are chunked over
sublanes. Grid: (P, n_gt_tiles).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_G = 512        # gt points per program (lanes)
_EC = 1024      # est points per in-kernel chunk (sublanes)
_FAR = 1e9      # padding coordinate: keeps the min over padded est correct


def _kernel(gtT_ref, est_ref, out_ref, *, n_ec):
    gtT = gtT_ref[0]                                  # (3, G) f32
    g2 = jnp.sum(gtT * gtT, axis=0, keepdims=True)    # (1, G)
    best = jnp.full((1, gtT.shape[1]), jnp.inf, jnp.float32)
    for c in range(n_ec):
        est_c = est_ref[0][c * _EC : (c + 1) * _EC]   # (EC, 3)
        e2 = jnp.sum(est_c * est_c, axis=1, keepdims=True)  # (EC, 1)
        cross = jax.lax.dot_general(
            est_c, gtT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)      # (EC, G) — VMEM only
        d2 = e2 + g2 - 2.0 * cross
        best = jnp.minimum(best, jnp.min(d2, axis=0, keepdims=True))
    out_ref[0] = jnp.maximum(best, 0.0)


def min_dist_sq_pallas(gt: jnp.ndarray, est: jnp.ndarray) -> jnp.ndarray:
    """Per gt point, min squared distance into the est cloud.

    gt, est: (P, N, 3) f32 — P poses of the same N-point model cloud under
    ground-truth / predicted transforms. Returns (P, N) f32 min-d2 (clamped
    at 0 against rounding).
    """
    P, N, _ = gt.shape
    N_est = est.shape[1]

    Np = -(-N // _G) * _G
    Ep = -(-N_est // _EC) * _EC
    gtT = jnp.pad(gt, ((0, 0), (0, Np - N), (0, 0))).transpose(0, 2, 1)
    # pad est with a far point so padded rows never win the min
    est_p = jnp.pad(est, ((0, 0), (0, Ep - N_est), (0, 0)),
                    constant_values=_FAR)

    out = pl.pallas_call(
        functools.partial(_kernel, n_ec=Ep // _EC),
        grid=(P, Np // _G),
        in_specs=[
            pl.BlockSpec((1, 3, _G), lambda p, g: (p, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ep, 3), lambda p, g: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, _G), lambda p, g: (p, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, 1, Np), jnp.float32),
    )(gtT, est_p)
    return out[:, 0, :N]
