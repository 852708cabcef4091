"""Static-shape detection ops: NMS, RoIAlign, box coding, anchors.

TPU-native equivalents of the torchvision C++/CUDA detection ops (N3 in
SURVEY §2.2) that back the reference's Mask R-CNN path
(models/backbone_maskrcnn.py:59-91). Everything here has FIXED shapes: NMS
runs a fixed number of suppression steps over padded candidate sets and
returns keep masks instead of variable-length index lists.

Oracles: torchvision.ops.nms / roi_align semantics (tested on CPU torch).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def pairwise_iou_xyxy(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) x (M, 4) -> (N, M) IoU."""
    area1 = jnp.clip(boxes1[:, 2] - boxes1[:, 0], 0) * jnp.clip(boxes1[:, 3] - boxes1[:, 1], 0)
    area2 = jnp.clip(boxes2[:, 2] - boxes2[:, 0], 0) * jnp.clip(boxes2[:, 3] - boxes2[:, 1], 0)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def nms_padded(
    boxes: jnp.ndarray,       # (N, 4) xyxy
    scores: jnp.ndarray,      # (N,) — invalid candidates must carry -inf
    iou_threshold: float,
    max_outputs: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with static shapes.

    Matches torchvision.ops.nms ordering (descending score, strictly-greater
    IoU suppression). Returns (keep_idx (max_outputs,) int32, keep_valid
    (max_outputs,) bool); invalid slots hold index 0.

    Implementation: one IoU matrix + a fori_loop of max_outputs greedy picks,
    each step masking the suppressed set — O(max_outputs * N) VPU work, no
    data-dependent shapes.
    """
    N = boxes.shape[0]
    iou = pairwise_iou_xyxy(boxes, boxes)                     # (N, N)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)

    def body(i, carry):
        alive_scores, keep_idx, keep_valid = carry
        best = jnp.argmax(alive_scores).astype(jnp.int32)
        best_score = alive_scores[best]
        valid = best_score > neg_inf
        keep_idx = keep_idx.at[i].set(jnp.where(valid, best, 0))
        keep_valid = keep_valid.at[i].set(valid)
        # suppress: the pick itself + everything with IoU > thresh to it
        suppress = (iou[best] > iou_threshold) | (jnp.arange(N) == best)
        alive_scores = jnp.where(valid & suppress, neg_inf, alive_scores)
        return alive_scores, keep_idx, keep_valid

    init = (scores, jnp.zeros(max_outputs, jnp.int32), jnp.zeros(max_outputs, bool))
    _, keep_idx, keep_valid = lax.fori_loop(0, max_outputs, body, init)
    return keep_idx, keep_valid


def batched_class_nms(
    boxes: jnp.ndarray,       # (N, 4)
    scores: jnp.ndarray,      # (N,)
    labels: jnp.ndarray,      # (N,) int
    valid: jnp.ndarray,       # (N,) bool
    iou_threshold: float,
    max_outputs: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-class NMS via the coordinate-offset trick (torchvision batched_nms):
    boxes of different classes are translated apart so one NMS suffices."""
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0)) + 1.0
    offsets = labels.astype(boxes.dtype)[:, None] * max_coord
    shifted = boxes + offsets
    masked_scores = jnp.where(valid, scores, -jnp.inf)
    return nms_padded(shifted, masked_scores, iou_threshold, max_outputs)


# ---------------------------------------------------------------------------
# RoIAlign
# ---------------------------------------------------------------------------

def roi_align(
    features: jnp.ndarray,    # (H, W, C) single level, single image
    boxes: jnp.ndarray,       # (R, 4) xyxy in IMAGE coordinates
    output_size: int,
    spatial_scale: float,
    sampling_ratio: int = 2,
    aligned: bool = False,
) -> jnp.ndarray:
    """RoIAlign (torchvision semantics) -> (R, output_size, output_size, C).

    Bilinear sampling with `sampling_ratio`^2 samples per bin, averaged.
    torchvision's legacy `aligned=False` (used inside MultiScaleRoIAlign by
    default in the 1.9-era reference) omits the -0.5 pixel shift.
    """
    H, W, C = features.shape
    R = boxes.shape[0]
    off = 0.5 if aligned else 0.0
    b = boxes * spatial_scale
    x0 = b[:, 0] - off
    y0 = b[:, 1] - off
    roi_w = jnp.maximum(b[:, 2] - off - x0, 1.0 if not aligned else 1e-6)
    roi_h = jnp.maximum(b[:, 3] - off - y0, 1.0 if not aligned else 1e-6)

    bin_w = roi_w / output_size
    bin_h = roi_h / output_size
    s = sampling_ratio
    # sample grid: for bin (i, j), samples at y0 + (i + (k+0.5)/s) * bin_h
    ii = jnp.arange(output_size)
    kk = (jnp.arange(s) + 0.5) / s
    # (R, out, s)
    ys = y0[:, None, None] + (ii[None, :, None] + kk[None, None, :]) * bin_h[:, None, None]
    xs = x0[:, None, None] + (ii[None, :, None] + kk[None, None, :]) * bin_w[:, None, None]
    ys = ys.reshape(R, output_size * s)
    xs = xs.reshape(R, output_size * s)

    # bilinear sample all (y, x) pairs: (R, oy*s, ox*s, C)
    def sample(ys_r, xs_r):
        # torchvision clamps sample coords into [0, H-1]/[0, W-1] when slightly
        # outside, zeroing only if further out (-1 tolerance)
        def lin(coords, size):
            c = jnp.clip(coords, 0.0, size - 1.0)
            lo = jnp.clip(jnp.floor(c), 0, size - 2).astype(jnp.int32)
            frac = c - lo
            outside = (coords < -1.0) | (coords > size)
            return lo, frac, outside

        ylo, yfrac, y_out = lin(ys_r, H)
        xlo, xfrac, x_out = lin(xs_r, W)
        # gather rows then cols (small R*out*s, XLA gather fine here)
        f = features
        g00 = f[ylo][:, xlo]          # (Ny, Nx, C)
        g01 = f[ylo][:, xlo + 1]
        g10 = f[ylo + 1][:, xlo]
        g11 = f[ylo + 1][:, xlo + 1]
        wy = yfrac[:, None, None]
        wx = xfrac[None, :, None]
        out = (
            g00 * (1 - wy) * (1 - wx)
            + g01 * (1 - wy) * wx
            + g10 * wy * (1 - wx)
            + g11 * wy * wx
        )
        mask = (~y_out[:, None]) & (~x_out[None, :])
        return out * mask[..., None]

    sampled = jax.vmap(sample)(ys, xs)                         # (R, Ny, Nx, C)
    sampled = sampled.reshape(R, output_size, s, output_size, s, C)
    return sampled.mean(axis=(2, 4))


def multiscale_roi_align(
    features: Sequence[jnp.ndarray],   # per level (H_l, W_l, C), strides given
    strides: Sequence[int],
    boxes: jnp.ndarray,                # (R, 4) xyxy image coords
    output_size: int = 7,
    sampling_ratio: int = 2,
    canonical_scale: int = 224,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """torchvision MultiScaleRoIAlign: FPN level by box scale (Eq. 1 of FPN).

    Computes RoIAlign on EVERY level and selects per-box — static shapes at
    the cost of len(levels) x the sampling FLOPs (tiny next to the backbone).
    """
    R = boxes.shape[0]
    w = jnp.clip(boxes[:, 2] - boxes[:, 0], 0)
    h = jnp.clip(boxes[:, 3] - boxes[:, 1], 0)
    scale = jnp.sqrt(w * h)
    # torchvision LevelMapper: lvl is the ABSOLUTE FPN level (stride 2^lvl);
    # the feature-list index is lvl - k_min where k_min = log2(strides[0])
    # (e.g. strides [4..32] -> k_min=2: a canonical 224 px box pools from
    # stride 16, not the coarsest map).
    k_min = int(round(math.log2(strides[0])))
    lvl = jnp.floor(canonical_level + jnp.log2(scale / canonical_scale + 1e-6))
    lvl = (jnp.clip(lvl, k_min, k_min + len(features) - 1) - k_min).astype(
        jnp.int32)

    outs = jnp.stack(
        [
            roi_align(f, boxes, output_size, 1.0 / s, sampling_ratio)
            for f, s in zip(features, strides)
        ]
    )                                                        # (L, R, o, o, C)
    return jnp.take_along_axis(
        outs, lvl[None, :, None, None, None], axis=0
    )[0]
