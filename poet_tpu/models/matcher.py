"""Pose matcher — bipartite prediction/target assignment, fully inside jit.

Parity target: `models/matcher.py:104-229` (PoseMatcher). The reference
computes cost matrices on device, syncs them to host, and runs scipy's
Hungarian per image — once per decoder layer per step. Here the whole thing is
one batched on-device computation:

  * costs per bbox_mode (gt: L1 of full boxes; jitter: class-mismatch
    indicator; backbone: center-L1 + class mismatch) — matcher.py:169-195,
  * rectangular (n_pred x n_tgt) problems are embedded in a square
    num_queries x num_queries matrix padded with a large constant, which
    preserves the rectangular optimum (tested in tests/test_hungarian.py),
  * solved by the exact JV solver in poet_tpu.ops.hungarian (vmapped),
  * backbone-mode post-filter (drop matches with class mismatch in specific
    mode, or GIoU < giou_thresh — matcher.py:205-227) becomes a validity mask.

The matcher only consumes pred_boxes/pred_classes, which are identical across
decoder layers (aux outputs reuse them, pose_estimation_transformer.py:416-418)
— so unlike the reference we compute the matching ONCE per step and share it
across aux losses: mathematically identical, dec_layers x cheaper.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from poet_tpu.ops.hungarian import hungarian
from poet_tpu.utils.boxes import box_cxcywh_to_xyxy, generalized_box_iou

BIG_COST = 1e6


class MatchResult(NamedTuple):
    """Assignment as fixed-size arrays.

    tgt_idx: (B, Q) int32 — target slot assigned to each prediction slot.
    valid:   (B, Q) bool — True where the pair is a real (kept) match.
    """

    tgt_idx: jnp.ndarray
    valid: jnp.ndarray

    @property
    def num_matched(self) -> jnp.ndarray:
        return jnp.sum(self.valid)


def match_poses(
    pred_boxes: jnp.ndarray,     # (B, Q, 4) cxcywh normalized (dummy = -1s)
    pred_classes: jnp.ndarray,   # (B, Q) int (dummy = -1)
    tgt_boxes: jnp.ndarray,      # (B, Q, 4)
    tgt_labels: jnp.ndarray,     # (B, Q) int (dummy = -1)
    n_pred: jnp.ndarray,         # (B,) number of real predictions
    n_tgt: jnp.ndarray,          # (B,) number of real targets
    bbox_mode: str = "gt",
    class_mode: str = "specific",
    cost_bbox: float = 1.0,
    cost_class: float = 1.0,
    giou_thresh: float = 0.5,
) -> MatchResult:
    B, Q = pred_classes.shape
    f32 = jnp.float32

    if bbox_mode == "gt":
        # L1 over full boxes (matcher.py:169-173)
        cost = jnp.sum(
            jnp.abs(pred_boxes[:, :, None, :] - tgt_boxes[:, None, :, :]), axis=-1
        ).astype(f32) * cost_bbox
    elif bbox_mode == "jitter":
        # pure class mismatch (matcher.py:175-181)
        mismatch = (pred_classes[:, :, None] != tgt_labels[:, None, :]).astype(f32)
        cost = mismatch * cost_class
    elif bbox_mode == "backbone":
        # center L1 + class mismatch (matcher.py:183-195)
        center_l1 = jnp.sum(
            jnp.abs(pred_boxes[:, :, None, :2] - tgt_boxes[:, None, :, :2]), axis=-1
        ).astype(f32)
        mismatch = (pred_classes[:, :, None] != tgt_labels[:, None, :]).astype(f32)
        cost = cost_bbox * center_l1 + cost_class * mismatch
    else:
        raise NotImplementedError(f"bbox_mode {bbox_mode}")

    # Pad to square: rows beyond n_pred / cols beyond n_tgt get a flat BIG cost
    # (matcher.py:198-202 slices them away; padding preserves the optimum).
    row_ids = jnp.arange(Q)[None, :, None]
    col_ids = jnp.arange(Q)[None, None, :]
    pad = (row_ids >= n_pred[:, None, None]) | (col_ids >= n_tgt[:, None, None])
    cost = jnp.where(pad, BIG_COST, cost)

    # Certified identity shortcut: every cost above is >= 0, so whenever the
    # diagonal is zero over the valid prefix the identity assignment has
    # total cost 0 == the global optimum (surplus rows land on pad columns
    # either way) and the JV solve is provably unnecessary. This is the
    # TRAINING common case by construction — gt/jitter queries are built
    # FROM the targets in order (pred_boxes == tgt_boxes row-for-row,
    # pose_estimation_transformer.py:203-239), so the in-jit JV while-loops
    # (~1.8 ms/step at bs=16) run only when the match is non-trivial.
    diag = jnp.diagonal(cost, axis1=1, axis2=2)                 # (B, Q)
    prefix = jnp.arange(Q)[None, :] < jnp.minimum(n_pred, n_tgt)[:, None]
    identity_opt = jnp.all(jnp.where(prefix, diag, 0.0) == 0.0)
    tgt_idx = jax.lax.cond(
        identity_opt,
        lambda c: jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32)[None],
                                   (B, Q)),
        hungarian, cost)                                        # (B, Q)
    valid = (jnp.arange(Q)[None, :] < n_pred[:, None]) & (tgt_idx < n_tgt[:, None])

    if bbox_mode == "backbone":
        # Post-filter (matcher.py:205-227): kill matches whose predicted class
        # disagrees (specific mode) or whose GIoU < giou_thresh.
        matched_tgt_boxes = jnp.take_along_axis(tgt_boxes, tgt_idx[..., None], axis=1)
        giou = _pairwise_diag_giou(pred_boxes, matched_tgt_boxes)
        valid &= giou >= giou_thresh
        if class_mode == "specific":
            matched_tgt_cls = jnp.take_along_axis(tgt_labels, tgt_idx, axis=1)
            valid &= pred_classes == matched_tgt_cls

    return MatchResult(tgt_idx=tgt_idx, valid=valid)


def match_hungarian(
    pred_logits: jnp.ndarray,    # (B, Q, n_classes)
    pred_boxes: jnp.ndarray,     # (B, Q, 4) cxcywh normalized
    tgt_boxes: jnp.ndarray,      # (B, Q, 4)
    tgt_labels: jnp.ndarray,     # (B, Q) int
    n_tgt: jnp.ndarray,          # (B,)
    cost_class: float = 1.0,
    cost_bbox: float = 1.0,
    cost_giou: float = 2.0,
) -> MatchResult:
    """Legacy DETR-style HungarianMatcher (focal class + box L1 + GIoU costs).

    Parity: models/matcher.py:25-101. Present in the reference but
    unreachable from its CLI (matcher_type choices=['pose'], main.py:108);
    kept for capability parity. All predictions are candidates (no n_pred).
    """
    B, Q = pred_boxes.shape[:2]
    f32 = jnp.float32
    alpha, gamma = 0.25, 2.0
    prob = jax.nn.sigmoid(pred_logits.astype(f32))           # (B, Q, C)
    # focal-style class cost evaluated at each target's label (matcher.py:82-86)
    labels = jnp.clip(tgt_labels, 0, pred_logits.shape[-1] - 1)
    p = jnp.take_along_axis(prob, labels[:, None, :], axis=2)        # (B, Q, Qt)
    neg = (1 - alpha) * (p ** gamma) * (-jnp.log(1 - p + 1e-8))
    pos = alpha * ((1 - p) ** gamma) * (-jnp.log(p + 1e-8))
    cls_cost = pos - neg

    l1 = jnp.sum(jnp.abs(pred_boxes[:, :, None] - tgt_boxes[:, None]), axis=-1)
    giou = jax.vmap(
        lambda a, b: generalized_box_iou(box_cxcywh_to_xyxy(a), box_cxcywh_to_xyxy(b))
    )(jnp.clip(pred_boxes, 0), jnp.clip(tgt_boxes, 0))

    C = cost_bbox * l1 + cost_class * cls_cost - cost_giou * giou
    col_ids = jnp.arange(Q)[None, None, :]
    C = jnp.where(col_ids >= n_tgt[:, None, None], BIG_COST, C.astype(f32))
    tgt_idx = hungarian(C)
    valid = jnp.take_along_axis(
        jnp.broadcast_to(jnp.arange(Q)[None], (B, Q)), tgt_idx, axis=1
    ) < n_tgt[:, None]
    return MatchResult(tgt_idx=tgt_idx, valid=valid)


def _pairwise_diag_giou(boxes1_cxcywh: jnp.ndarray, boxes2_cxcywh: jnp.ndarray) -> jnp.ndarray:
    """GIoU of corresponding (B, Q, 4) box pairs (diagonal of the pair matrix)."""
    b1 = box_cxcywh_to_xyxy(boxes1_cxcywh)
    b2 = box_cxcywh_to_xyxy(boxes2_cxcywh)
    area1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    area2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    lt = jnp.maximum(b1[..., :2], b2[..., :2])
    rb = jnp.minimum(b1[..., 2:], b2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    iou = inter / union
    lt_e = jnp.minimum(b1[..., :2], b2[..., :2])
    rb_e = jnp.maximum(b1[..., 2:], b2[..., 2:])
    wh_e = jnp.clip(rb_e - lt_e, 0)
    enc = wh_e[..., 0] * wh_e[..., 1]
    return iou - (enc - union) / enc
