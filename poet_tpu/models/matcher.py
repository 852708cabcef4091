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

    tgt_idx = hungarian(cost)                                   # (B, Q)
    valid = (jnp.arange(Q)[None, :] < n_pred[:, None]) & (
        jnp.take_along_axis(jnp.broadcast_to(jnp.arange(Q)[None, :], (B, Q)), tgt_idx, axis=1)
        < n_tgt[:, None]
    )

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
