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
import os
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
    """NMS with static shapes, exact torchvision.ops.nms semantics.

    Returns (keep_idx (max_outputs,) int32, keep_valid (max_outputs,) bool);
    keep order is descending score (ties: ascending original index, matching
    torchvision's stable sort); invalid slots hold index 0.

    Default implementation is the parallel FIXED-POINT suppression
    (`nms_fixed_point`), which produces the identical keep set in
    O(longest-suppression-chain) batched steps. `POET_NMS_GREEDY=1` selects
    the sequential greedy reference (`nms_greedy`) for A/Bs; the two agree
    bit-for-bit (tested).
    """
    if os.environ.get("POET_NMS_GREEDY", "0") == "1":
        return nms_greedy(boxes, scores, iou_threshold, max_outputs)
    return nms_fixed_point(boxes, scores, iou_threshold, max_outputs)


def nms_fixed_point(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy-NMS keep set via parallel fixed-point iteration.

    Sort candidates by descending score (stable). Greedy keeps j iff no
    higher-ranked kept i suppresses it: k_j = valid_j AND NOT any_{i<j}
    (k_i AND iou_ij > thr). That recurrence is the unique fixed point of
    the monotone-free map f(k)_j = valid_j AND NOT any_i(sup_ij AND k_i)
    restricted to the strict upper triangle, and Jacobi iteration from
    k = valid converges to it in at most `depth` steps where depth is the
    longest suppression chain (each sorted position stabilizes one step
    after all its predecessors; trivially <= N, typically ~5-15). Replaces
    the reference-shaped sequential greedy loop (1000 tiny device steps per
    image per level — the profiled "NMS step storm" of the r2 detect+pose
    benchmark) with a handful of batched VPU matvec steps.
    """
    N = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    order = jnp.argsort(-scores)                    # stable: ties index-asc
    b = boxes[order]
    s = scores[order]
    valid = s > neg_inf
    iou = pairwise_iou_xyxy(b, b)
    idx = jnp.arange(N)
    sup = (idx[:, None] < idx[None, :]) & (iou > iou_threshold)

    def body(carry):
        k, _, t = carry
        k_new = valid & ~jnp.any(sup & k[:, None], axis=0)
        return k_new, jnp.any(k_new != k), t + 1

    def cond(carry):
        _, changed, t = carry
        return changed & (t < N)

    k, _, _ = lax.while_loop(cond, body, (valid, jnp.bool_(True), jnp.int32(0)))

    kept_scores = jnp.where(k, s, -jnp.inf)
    k_take = min(max_outputs, N)
    top_s, top_i = lax.top_k(kept_scores, k_take)
    keep_valid = top_s > -jnp.inf
    keep_idx = jnp.where(keep_valid, order[top_i], 0).astype(jnp.int32)
    if k_take < max_outputs:
        pad = max_outputs - k_take
        keep_idx = jnp.pad(keep_idx, (0, pad))
        keep_valid = jnp.pad(keep_valid, (0, pad))
    return keep_idx, keep_valid


def nms_greedy(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sequential greedy NMS (the literal torchvision recurrence).

    One IoU matrix + a fori_loop of max_outputs greedy picks, each step
    masking the suppressed set — O(max_outputs) sequential device steps.
    Kept as the cross-check oracle for `nms_fixed_point`.
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
    C = features[0].shape[-1]
    L = len(features)
    # Degenerate-geometry guards (ADVICE r2): a 1-pixel level would make the
    # corner clip below produce -1 (clip with min>max returns max) and the
    # negative flat index would silently wrap into another level's rows; and
    # R == 0 would make the chunking below divide by zero at trace time.
    if R == 0:
        return jnp.zeros((0, output_size, output_size, C), features[0].dtype)
    for li, f in enumerate(features):
        if min(f.shape[0], f.shape[1]) < 2:
            raise ValueError(
                f"multiscale_roi_align: level {li} is {f.shape[0]}x{f.shape[1]};"
                " every pyramid level needs H >= 2 and W >= 2 for bilinear"
                " corner gathers")
    w = jnp.clip(boxes[:, 2] - boxes[:, 0], 0)
    h = jnp.clip(boxes[:, 3] - boxes[:, 1], 0)
    scale = jnp.sqrt(w * h)
    # torchvision LevelMapper: lvl is the ABSOLUTE FPN level (stride 2^lvl);
    # the feature-list index is lvl - k_min where k_min = log2(strides[0])
    # (e.g. strides [4..32] -> k_min=2: a canonical 224 px box pools from
    # stride 16, not the coarsest map).
    k_min = int(round(math.log2(strides[0])))
    lvl = jnp.floor(canonical_level + jnp.log2(scale / canonical_scale + 1e-6))
    lvl = (jnp.clip(lvl, k_min, k_min + L - 1) - k_min).astype(jnp.int32)

    # Each box samples ONLY its assigned level, through one flat gather into
    # the concatenated pyramid. The previous compute-every-level-and-select
    # structure materialized a row-gathered (R*Ny, W0, C) intermediate per
    # level — 36.7 GB f32 at the production RPN scale (B=16 x 1000 proposals,
    # level-0 120x160x256), a guaranteed HBM OOM. Level-dependent geometry
    # (stride, H, W, row offset) becomes per-box scalars via jnp.take, and
    # the box axis is chunked so the peak corner-gather footprint stays
    # bounded regardless of R (and of any vmapped batch axis outside).
    H_arr = jnp.asarray([f.shape[0] for f in features], jnp.float32)
    W_arr = jnp.asarray([f.shape[1] for f in features], jnp.float32)
    W_int = jnp.asarray([f.shape[1] for f in features], jnp.int32)
    sizes = [f.shape[0] * f.shape[1] for f in features]
    off_arr = jnp.asarray([sum(sizes[:i]) for i in range(L)], jnp.int32)
    inv_stride = jnp.asarray([1.0 / s for s in strides], jnp.float32)
    flat = jnp.concatenate([f.reshape(-1, C) for f in features], axis=0)

    s = sampling_ratio
    N = output_size * s
    ii = jnp.arange(output_size, dtype=jnp.float32)
    kk = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    grid = (ii[:, None] + kk[None, :]).reshape(N)            # (N,)

    def pool_chunk(args):
        bx, kb = args                                        # (r, 4), (r,)
        sc = inv_stride[kb]                                  # (r,)
        b = bx.astype(jnp.float32) * sc[:, None]
        x0, y0 = b[:, 0], b[:, 1]
        bin_w = jnp.maximum(b[:, 2] - x0, 1.0) / output_size
        bin_h = jnp.maximum(b[:, 3] - y0, 1.0) / output_size
        ys = y0[:, None] + grid[None, :] * bin_h[:, None]    # (r, N)
        xs = x0[:, None] + grid[None, :] * bin_w[:, None]

        def lin(coords, size):                               # size (r,)
            c = jnp.clip(coords, 0.0, size[:, None] - 1.0)
            lo = jnp.clip(jnp.floor(c), 0.0, size[:, None] - 2.0)
            frac = c - lo
            outside = (coords < -1.0) | (coords > size[:, None])
            return lo.astype(jnp.int32), frac, outside

        ylo, yfrac, y_out = lin(ys, H_arr[kb])
        xlo, xfrac, x_out = lin(xs, W_arr[kb])
        wk = W_int[kb][:, None, None]                        # (r, 1, 1)
        base = (off_arr[kb][:, None, None]
                + ylo[:, :, None] * wk + xlo[:, None, :])    # (r, N, N)
        g00 = flat[base]
        g01 = flat[base + 1]
        g10 = flat[base + wk]
        g11 = flat[base + wk + 1]                            # (r, N, N, C)
        # interpolate in the FEATURE dtype: f32 weights promoted every corner
        # to f32 and made XLA materialize four 205 MB fusion outputs per
        # chunk (measured 245 ms/iter of the detect+pose batch); bf16-weight
        # interpolation of bf16 features halves that traffic (f32 features
        # keep f32 weights — bit-identical to the pre-flat formulation)
        wy = yfrac.astype(flat.dtype)[:, :, None, None]
        wx = xfrac.astype(flat.dtype)[:, None, :, None]
        out = (
            g00 * (1 - wy) * (1 - wx)
            + g01 * (1 - wy) * wx
            + g10 * wy * (1 - wx)
            + g11 * wy * wx
        )
        mask = (~y_out[:, :, None]) & (~x_out[:, None, :])
        out = out * mask[..., None].astype(out.dtype)
        r = out.shape[0]
        return out.reshape(r, output_size, s, output_size, s, C).mean((2, 4))

    chunk = min(64, R)
    pad = (-R) % chunk
    bx_p = jnp.pad(boxes, ((0, pad), (0, 0)), constant_values=1.0)
    kb_p = jnp.pad(lvl, (0, pad))
    bx_c = bx_p.reshape(-1, chunk, 4)
    kb_c = kb_p.reshape(-1, chunk)
    out = lax.map(pool_chunk, (bx_c, kb_c))                  # (n, chunk, o, o, C)
    return out.reshape(-1, output_size, output_size, C)[:R]
