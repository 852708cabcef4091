"""SO(3) math: 6D Gram–Schmidt, exp/log maps, geodesic distances (pure jnp).

Functional parity with the reference `util/rotation_utils.py` (pytorch3d-derived)
and the 6D->SO(3) decoding in `models/pose_estimation_transformer.py:434-451`,
re-expressed branch-free so everything jits and differentiates on TPU:
the reference's boolean-indexed Taylor guards become `jnp.where` selects with
gradient-safe denominators.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def rotation_6d_to_matrix(rot_6d: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) -> (..., 3, 3) via Gram–Schmidt (Zhou et al., CVPR'19).

    Parity: models/pose_estimation_transformer.py:434-451 — columns are
    [x, y, z] with x = norm(m1), z = norm(x × m2), y = z × x.
    """
    m1 = rot_6d[..., 0:3]
    m2 = rot_6d[..., 3:6]
    x = _l2_normalize(m1)
    z = _l2_normalize(jnp.cross(x, m2))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def _l2_normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """torch.nn.functional.normalize parity: v / max(||v||, eps)."""
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, eps)


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric. Parity: util/rotation_utils.py:321-352."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def hat_inv(h: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) skew-symmetric -> (..., 3). Parity: util/rotation_utils.py:289-318.

    The reference's host-side skew-symmetry assert is intentionally dropped
    (cannot run inside jit); callers own that invariant.
    """
    return jnp.stack([h[..., 2, 1], h[..., 0, 2], h[..., 1, 0]], axis=-1)


def acos_linear_extrapolation(x: jnp.ndarray, bounds=(-1.0 + 1e-4, 1.0 - 1e-4)) -> jnp.ndarray:
    """acos with linear extrapolation outside `bounds` for finite gradients.

    Parity: util/rotation_utils.py:13-67 (pytorch3d). Branch-free: the three
    regions (below lower bound / inside / above upper bound) are selected with
    nested `where`, and acos only ever sees clamped inputs.
    """
    lower, upper = bounds
    inside = jnp.arccos(jnp.clip(x, lower, upper))
    below = _acos_linear_approx(x, lower)
    above = _acos_linear_approx(x, upper)
    return jnp.where(x <= lower, below, jnp.where(x >= upper, above, inside))


def _acos_linear_approx(x: jnp.ndarray, x0: float) -> jnp.ndarray:
    dacos_dx = -1.0 / math.sqrt(1.0 - x0 * x0)
    return (x - x0) * dacos_dx + math.acos(x0)


def so3_rotation_angle(
    R: jnp.ndarray,
    eps: float = 1e-4,
    cos_angle: bool = False,
    cos_bound: float = 1e-4,
) -> jnp.ndarray:
    """Rotation angle(s) of (..., 3, 3) matrices. Parity: util/rotation_utils.py:141-191.

    The reference raises on traces outside [-1-eps, 3+eps]; inside jit we
    saturate via the acos extrapolation instead.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    phi_cos = (trace - 1.0) * 0.5
    if cos_angle:
        return phi_cos
    if cos_bound > 0.0:
        bound = 1.0 - cos_bound
        return acos_linear_extrapolation(phi_cos, (-bound, bound))
    return jnp.arccos(phi_cos)


def so3_exp_map(log_rot: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Rodrigues' formula, (..., 3) -> (..., 3, 3). Parity: util/rotation_utils.py:194-241."""
    nrms = jnp.sum(log_rot * log_rot, axis=-1)
    rot_angles = jnp.sqrt(jnp.clip(nrms, eps))
    inv = 1.0 / rot_angles
    fac1 = inv * jnp.sin(rot_angles)
    fac2 = inv * inv * (1.0 - jnp.cos(rot_angles))
    skews = hat(log_rot)
    skews_sq = skews @ skews
    eye = jnp.eye(3, dtype=log_rot.dtype)
    return fac1[..., None, None] * skews + fac2[..., None, None] * skews_sq + eye


def so3_log_map(R: jnp.ndarray, eps: float = 1e-4, cos_bound: float = 1e-4) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3) axis-angle. Parity: util/rotation_utils.py:244-286.

    The tiny-sin Taylor guard (phi_factor = 0.5 + phi²/12 when |sin phi| <=
    eps/2) is expressed as a `where` with a safe denominator so the untaken
    branch contributes no NaN gradients.
    """
    phi = so3_rotation_angle(R, cos_bound=cos_bound, eps=eps)
    phi_sin = jnp.sin(phi)
    ok = jnp.abs(phi_sin) > (0.5 * eps)
    safe_sin = jnp.where(ok, phi_sin, 1.0)
    phi_factor = jnp.where(ok, phi / (2.0 * safe_sin), 0.5 + (phi * phi) / 12.0)
    log_rot_hat = phi_factor[..., None, None] * (R - jnp.swapaxes(R, -1, -2))
    return hat_inv(log_rot_hat)


def geodesic_distance(R1: jnp.ndarray, R2: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Geodesic angle between rotation matrices, in radians.

    Parity with the rotation loss (models/pose_estimation_transformer.py:515-534):
    arccos(0.5 * (trace(R1 R2ᵀ) - 1)) with the trace-cosine clamped to
    ±(1 - eps).
    """
    prod = R1 @ jnp.swapaxes(R2, -1, -2)
    trace = prod[..., 0, 0] + prod[..., 1, 1] + prod[..., 2, 2]
    theta = jnp.clip(0.5 * (trace - 1.0), -1.0 + eps, 1.0 - eps)
    return jnp.arccos(theta)


def rotation_error_deg(R_pred: jnp.ndarray, R_gt: jnp.ndarray) -> jnp.ndarray:
    """Evaluator-parity rotation error in degrees.

    Parity: evaluation_tools/pose_evaluator.py:584-599 — trace clamped to
    [-1, 3] (not ±(1-eps)) before arccos, then converted to degrees.
    """
    rot = R_pred @ jnp.swapaxes(R_gt, -1, -2)
    trace = rot[..., 0, 0] + rot[..., 1, 1] + rot[..., 2, 2]
    trace = jnp.clip(trace, -1.0, 3.0)
    return jnp.degrees(jnp.arccos(0.5 * (trace - 1.0)))
