"""Set criterion — translation/rotation losses over Hungarian-matched pairs.

Parity target: `SetCriterion` in models/pose_estimation_transformer.py:454-674.
Differences by design (TPU-native):
  * operates on STACKED per-decoder-layer outputs (n_layers, B, Q, ...) and a
    single shared `MatchResult` — the reference re-runs the matcher per aux
    layer but the matching is provably identical across layers (it only reads
    pred_boxes/pred_classes, which aux outputs share),
  * matched-pair selection is masking + gather instead of ragged indexing, so
    the whole loss is one fused XLA program,
  * every loss normalizes by max(n_matched, 1) to stay finite when a batch has
    zero kept matches (backbone mode can filter everything out).

Loss formulas are bit-parity with the reference:
  translation  — per-pair L2 norm, mean over matched pairs          (:472-488)
  rotation     — geodesic arccos(0.5 (tr(R R̃ᵀ) − 1)), ±(1−1e−6)     (:515-534)
  quaternion   — −log(⟨q, q̃⟩² + 1e−4)                               (:564-586)
  silho_quat   — log(1 − |⟨q, q̃⟩| + 1e−4)                           (:588-609)
  aleatoric translation / rotation (s = log σ² parametrization)     (:490-513, :536-562)
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from poet_tpu.models.matcher import MatchResult
from poet_tpu.utils.rotations import so3_log_map


def _gather_tgt(tgt: jnp.ndarray, match: MatchResult) -> jnp.ndarray:
    """Gather per-prediction targets: (B, Q, ...) -> (B, Q, ...) reordered."""
    idx = match.tgt_idx
    extra = tgt.ndim - 2
    idx = idx.reshape(idx.shape + (1,) * extra)
    return jnp.take_along_axis(tgt, idx, axis=1)


def _masked_mean_sum(per_pair: jnp.ndarray, match: MatchResult) -> jnp.ndarray:
    """sum over valid pairs / n_valid (reference's `sum() / n_obj`)."""
    n = jnp.maximum(match.num_matched, 1).astype(per_pair.dtype)
    return jnp.sum(jnp.where(match.valid, per_pair, 0.0)) / n


def loss_translation(pred_t, tgt_t, match: MatchResult) -> jnp.ndarray:
    """L2-norm loss. Parity: pose_estimation_transformer.py:472-488."""
    tgt = _gather_tgt(tgt_t, match)
    d = jnp.sqrt(jnp.sum(jnp.square(pred_t - tgt), axis=-1) + 0.0)
    return _masked_mean_sum(d, match)


def loss_translation_aleatoric(pred_t, pred_s, tgt_t, match: MatchResult) -> jnp.ndarray:
    """Parity: pose_estimation_transformer.py:490-513 (s = log σ²)."""
    tgt = _gather_tgt(tgt_t, match)
    diff = tgt - pred_t
    s_sum = jnp.sum(pred_s, axis=-1)
    scaled = jnp.sum(jnp.exp(-pred_s) * jnp.square(diff), axis=-1)
    per_pair = scaled + s_sum
    n = jnp.maximum(match.num_matched, 1).astype(per_pair.dtype)
    return jnp.sum(jnp.where(match.valid, per_pair, 0.0)) / (2.0 * n)


def loss_rotation(pred_R, tgt_R, match: MatchResult, eps: float = 1e-6) -> jnp.ndarray:
    """Geodesic loss in radians. Parity: pose_estimation_transformer.py:515-534."""
    tgt = _gather_tgt(tgt_R, match)
    prod = pred_R @ jnp.swapaxes(tgt, -1, -2)
    trace = prod[..., 0, 0] + prod[..., 1, 1] + prod[..., 2, 2]
    theta = jnp.clip(0.5 * (trace - 1.0), -1.0 + eps, 1.0 - eps)
    return _masked_mean_sum(jnp.arccos(theta), match)


def loss_rotation_aleatoric(pred_R, pred_s, tgt_R, match: MatchResult) -> jnp.ndarray:
    """Parity: pose_estimation_transformer.py:536-562 — log-map residual."""
    tgt = _gather_tgt(tgt_R, match)
    diff = pred_R @ jnp.swapaxes(tgt, -1, -2)
    v = so3_log_map(diff)
    s_sum = jnp.sum(pred_s, axis=-1)
    scaled = jnp.sum(jnp.exp(-pred_s) * jnp.square(v), axis=-1)
    per_pair = scaled + s_sum
    n = jnp.maximum(match.num_matched, 1).astype(per_pair.dtype)
    return jnp.sum(jnp.where(match.valid, per_pair, 0.0)) / (2.0 * n)


def loss_quaternion(pred_q, tgt_q, match: MatchResult, eps: float = 1e-4) -> jnp.ndarray:
    """Parity: pose_estimation_transformer.py:564-586."""
    tgt = _gather_tgt(tgt_q, match)
    dp = jnp.sum(pred_q * tgt, axis=-1)
    return _masked_mean_sum(-jnp.log(jnp.square(dp) + eps), match)


def loss_silho_quaternion(pred_q, tgt_q, match: MatchResult, eps: float = 1e-4) -> jnp.ndarray:
    """Parity: pose_estimation_transformer.py:588-609."""
    tgt = _gather_tgt(tgt_q, match)
    dp = jnp.sum(pred_q * tgt, axis=-1)
    return _masked_mean_sum(jnp.log(1.0 - jnp.abs(dp) + eps), match)


def compute_losses(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    match: MatchResult,
    rotation_mode: str = "6d",
    aleatoric: bool = False,
) -> Dict[str, jnp.ndarray]:
    """All per-layer losses.

    outputs carries stacked decoder-layer tensors:
      translations (n_layers, B, Q, 3); rotations (n_layers, B, Q, 3, 3) for
      6d mode or (n_layers, B, Q, 4) for quaternion modes; optional
      translations_aleatoric / rotations_aleatoric (n_layers, B, Q, 3).

    Returns the reference's loss-dict naming: final layer 'loss_trans' /
    'loss_rot', aux layers suffixed '_{i}' for i in [0, n_layers-2]
    (pose_estimation_transformer.py:655-662).
    """
    trans = outputs["translations"]
    rots = outputs["rotations"]
    n_layers = trans.shape[0]

    # vmap over the stacked layer axis: one batched loss chain instead of
    # n_layers chains of tiny (B, Q)-shaped kernels. Wall-time-neutral at
    # bs=16 (the small fusions overlap with the backward) but 6x fewer
    # dispatched kernels; numerics identical — vmap is exact.
    if aleatoric:
        lt_all = jax.vmap(lambda t, s: loss_translation_aleatoric(
            t, s, targets["relative_position"], match))(
                trans, outputs["translations_aleatoric"])
        lr_all = jax.vmap(lambda r, s: loss_rotation_aleatoric(
            r, s, targets["relative_rotation"], match))(
                rots, outputs["rotations_aleatoric"])
    elif rotation_mode == "6d":
        lt_all = jax.vmap(lambda t: loss_translation(
            t, targets["relative_position"], match))(trans)
        lr_all = jax.vmap(lambda r: loss_rotation(
            r, targets["relative_rotation"], match))(rots)
    elif rotation_mode == "quat":
        lt_all = jax.vmap(lambda t: loss_translation(
            t, targets["relative_position"], match))(trans)
        lr_all = jax.vmap(lambda r: loss_quaternion(
            r, targets["relative_quaternions"], match))(rots)
    elif rotation_mode == "silho_quat":
        lt_all = jax.vmap(lambda t: loss_translation(
            t, targets["relative_position"], match))(trans)
        lr_all = jax.vmap(lambda r: loss_silho_quaternion(
            r, targets["relative_quaternions"], match))(rots)
    else:
        raise NotImplementedError(rotation_mode)

    losses: Dict[str, jnp.ndarray] = {}
    for lvl in range(n_layers):
        suffix = "" if lvl == n_layers - 1 else f"_{lvl}"
        losses[f"loss_trans{suffix}"] = lt_all[lvl]
        losses[f"loss_rot{suffix}"] = lr_all[lvl]
    return losses


def weighted_total(
    losses: Dict[str, jnp.ndarray],
    translation_coef: float = 1.0,
    rotation_coef: float = 1.0,
) -> jnp.ndarray:
    """Scalar training loss. Parity: engine.py:58 with the weight dict built at
    pose_estimation_transformer.py:715,729-734 (same coef for aux suffixes)."""
    total = 0.0
    for k, v in losses.items():
        if k.startswith("loss_trans"):
            total = total + translation_coef * v
        elif k.startswith("loss_rot"):
            total = total + rotation_coef * v
    return total
