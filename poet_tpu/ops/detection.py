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
    """(N, 4) x (M, 4) -> (N, M) IoU.

    Per-coordinate scalar arithmetic (no stacked (..., 2) corner axis): the
    stacked form made XLA materialize (N, M, 2) min/max intermediates —
    measured ~14 ms/iter of HBM traffic across the 22 per-class NMS matrices
    of the detect+pose batch — where the scalar chain fuses into the single
    suppression-predicate output."""
    x1a, y1a, x2a, y2a = (boxes1[:, i] for i in range(4))
    x1b, y1b, x2b, y2b = (boxes2[:, i] for i in range(4))
    area1 = jnp.clip(x2a - x1a, 0) * jnp.clip(y2a - y1a, 0)
    area2 = jnp.clip(x2b - x1b, 0) * jnp.clip(y2b - y1b, 0)
    iw = jnp.clip(
        jnp.minimum(x2a[:, None], x2b[None, :])
        - jnp.maximum(x1a[:, None], x1b[None, :]), 0)
    ih = jnp.clip(
        jnp.minimum(y2a[:, None], y2b[None, :])
        - jnp.maximum(y1a[:, None], y1b[None, :]), 0)
    inter = iw * ih
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


def nms_keep_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Greedy-NMS keep set via parallel fixed-point iteration -> (N,) bool
    in ORIGINAL candidate order.

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
    return jnp.zeros(N, bool).at[order].set(k)


def nms_fixed_point(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-point NMS (`nms_keep_mask`) + top-`max_outputs` extraction."""
    N = boxes.shape[0]
    keep = nms_keep_mask(boxes, scores, iou_threshold)
    kept_scores = jnp.where(keep, scores, -jnp.inf)
    k_take = min(max_outputs, N)
    top_s, top_i = lax.top_k(kept_scores, k_take)
    keep_valid = top_s > -jnp.inf
    keep_idx = jnp.where(keep_valid, top_i, 0).astype(jnp.int32)
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


def exact_class_nms_mask(
    boxes_pc: jnp.ndarray,    # (P * ncls, 4) class-specific decoded boxes
    scores_pc: jnp.ndarray,   # (P * ncls,) — invalid candidates -inf
    ncls: int,
    iou_threshold: float,
) -> jnp.ndarray:
    """EXACT per-class greedy-NMS keep mask over the full candidate set.

    torchvision's batched_nms suppresses only within a class; running one
    fixed-point NMS per class over that class's P candidates is equivalent
    to the coordinate-offset trick on all P*ncls candidates but keeps every
    IoU matrix at (P, P) instead of (P*ncls)^2 — exact with NO candidate
    cap at static shapes (the r2 VERDICT's nms_candidates concern: a
    score-top-k cap can drop boxes that survive suppression when hundreds
    of near-tied candidates cluster above them). Classes iterate under
    lax.map so the peak footprint stays one (P, P) matrix per vmapped image.

    Candidate layout is proposal-major/class-minor (p * ncls + c), matching
    MaskRCNNDetector.postprocess.
    """
    P = boxes_pc.shape[0] // ncls
    boxes_cls = boxes_pc.reshape(P, ncls, 4).transpose(1, 0, 2)   # (ncls, P, 4)
    scores_cls = scores_pc.reshape(P, ncls).T                     # (ncls, P)
    keep_cls = lax.map(
        lambda a: nms_keep_mask(a[0], a[1], iou_threshold),
        (boxes_cls, scores_cls),
    )                                                             # (ncls, P)
    return keep_cls.T.reshape(P * ncls)


def class_nms_select_pruned(
    boxes_pc: jnp.ndarray,    # (PN, 4) class-specific decoded boxes
    scores_pc: jnp.ndarray,   # (PN,) — invalid candidates -inf
    labels_pc: jnp.ndarray,   # (PN,) int class ids
    iou_threshold: float,
    max_detections: int,
    prune_k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-class NMS + top-`max_detections` selection over ONLY the global
    score-top-`prune_k` candidates, with a PROVABLE exactness certificate.

    Returns (sel (md,) int32 indices into the PN set, keep_valid (md,) bool,
    certified () bool). When `certified` is True the selection is bit-
    identical to exact per-class NMS of the FULL candidate set followed by
    top-`max_detections` — the caller only needs the exact fallback when it
    is False.

    Why pruning is exact under the certificate: greedy NMS processes
    candidates in (score desc, index asc) order and a candidate's keep
    decision depends only on SAME-CLASS candidates ranked before it. The
    global top-k under that same total order contains, per class, a PREFIX
    of the class's processing order (a tied-at-the-boundary candidate that
    precedes an included one would itself rank inside the top-k), so every
    pruned candidate's keep bit equals its full-run keep bit. The final
    top-`max_detections` over kept scores can then differ from the full run
    only if a DROPPED candidate (all of score <= s_next, the (k+1)-th
    global score) could enter it — impossible when either (a) nothing valid
    was dropped (s_next == -inf) or (b) at least `max_detections` pruned
    candidates are kept AND the md-th kept score strictly exceeds s_next
    (strictness also settles float-tie ordering at the boundary).

    This replaces the (P, P)-per-class exact suppression (~25 ms/batch of
    the r3 detect+pose profile: the pred[22,16,1000] fixed point + its
    16000-wide score/mask fusions) with ONE (prune_k, prune_k) fixed point
    via the coordinate-offset trick — the certificate makes it a pure perf
    rewrite, not the unsafe top-k cap of `nms_candidates` (VERDICT r3
    next #5). Reference semantics raced: torchvision batched_nms inside
    roi_heads, driven at models/backbone_maskrcnn.py:91.
    """
    PN = boxes_pc.shape[0]
    md = max_detections
    k = min(prune_k, PN - 1)
    if k < md:
        raise ValueError(f"prune_k ({prune_k}) must allow at least "
                         f"max_detections ({md}) candidates")
    s_k1, i_k1 = lax.top_k(scores_pc, k + 1)
    cand_s, cand_i, s_next = s_k1[:k], i_k1[:k], s_k1[k]
    cand_boxes = boxes_pc[cand_i]
    cand_labels = labels_pc[cand_i]
    finite = jnp.isfinite(cand_s)
    # coordinate-offset trick: classes can never overlap
    max_coord = jnp.max(jnp.where(finite[:, None], cand_boxes, 0.0)) + 1.0
    shifted = cand_boxes + cand_labels.astype(cand_boxes.dtype)[:, None] * max_coord
    keep = nms_keep_mask(shifted, cand_s, iou_threshold)
    kept_scores = jnp.where(keep, cand_s, -jnp.inf)
    top_s, sel_k = lax.top_k(kept_scores, md)
    keep_valid = jnp.isfinite(top_s)
    certified = (s_next == -jnp.inf) | (
        (jnp.sum(keep) >= md) & (top_s[md - 1] > s_next)
    )
    sel = jnp.where(keep_valid, cand_i[sel_k], 0).astype(jnp.int32)
    return sel, keep_valid, certified


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

    Single-image view of `multiscale_roi_align_batched` (same POET_ROI_IMPL
    dispatch: pallas / slab / auto). POET_ROI_IMPL=flat selects the
    corner-gather formulation (kept as the cross-check oracle; the r2
    profile showed it runs at ~6% HBM bandwidth at production scale).
    """
    if os.environ.get("POET_ROI_IMPL", "auto") == "flat":
        return _multiscale_roi_align_flat(
            features, strides, boxes, output_size, sampling_ratio,
            canonical_scale, canonical_level)
    return multiscale_roi_align_batched(
        [f[None] for f in features], strides, boxes[None],
        output_size=output_size, sampling_ratio=sampling_ratio,
        canonical_scale=canonical_scale, canonical_level=canonical_level)[0]


def _roi_level_geometry(shapes, strides, boxes, canonical_scale,
                        canonical_level):
    """Shared LevelMapper + flat-table geometry. `shapes` = [(H_l, W_l)]."""
    L = len(shapes)
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
    H_arr = jnp.asarray([s[0] for s in shapes], jnp.float32)
    W_arr = jnp.asarray([s[1] for s in shapes], jnp.float32)
    W_int = jnp.asarray([s[1] for s in shapes], jnp.int32)
    inv_stride = jnp.asarray([1.0 / s for s in strides], jnp.float32)
    return lvl, H_arr, W_arr, W_int, inv_stride


def _roi_sample_coords(boxes_lvl, grid, output_size, H_of, W_of):
    """Per-box sample coordinates + corner data (torchvision semantics).

    boxes_lvl: (r, 4) boxes scaled into their assigned level's pixels.
    Returns xlo/xfrac/x_out (r, N) and ylo/yfrac/y_out (r, N).
    """
    x0, y0 = boxes_lvl[:, 0], boxes_lvl[:, 1]
    bin_w = jnp.maximum(boxes_lvl[:, 2] - x0, 1.0) / output_size
    bin_h = jnp.maximum(boxes_lvl[:, 3] - y0, 1.0) / output_size
    xs = x0[:, None] + grid[None, :] * bin_w[:, None]       # (r, N)
    ys = y0[:, None] + grid[None, :] * bin_h[:, None]

    def lin(coords, size):                                   # size (r,)
        c = jnp.clip(coords, 0.0, size[:, None] - 1.0)
        lo = jnp.clip(jnp.floor(c), 0.0, size[:, None] - 2.0)
        frac = c - lo
        outside = (coords < -1.0) | (coords > size[:, None])
        return lo.astype(jnp.int32), frac, outside

    xlo, xfrac, x_out = lin(xs, W_of)
    ylo, yfrac, y_out = lin(ys, H_of)
    return xlo, xfrac, x_out, ylo, yfrac, y_out


def _gather_slabs(flat, starts, window):
    """Gather (window, C) contiguous row slabs: starts (...,) -> (..., window, C).

    The gather runs through a singleton vmap: XLA lowers BATCHED gathers via
    the fast parallel gather fusion, but a plain 2-D operand takes the
    sequential dynamic-slice while-loop path (measured 706 ms/iter at the
    production detect+pose scale vs ~60 ms for the identical batched form,
    on-chip A/B 2026-08-19). With batch=1 the batch dim is degenerate, so
    slab rows stay physically contiguous whatever layout XLA assigns."""
    C = flat.shape[1]

    def one(f, idx):
        return lax.gather(
            f,
            idx,
            lax.GatherDimensionNumbers(
                offset_dims=(1, 2),
                collapsed_slice_dims=(),
                start_index_map=(0,),
            ),
            slice_sizes=(window, C),
        )

    idx = starts.reshape(-1, 1)
    out = jax.vmap(one)(flat[None], idx[None])[0]
    return out.reshape(*starts.shape, window, C)


def _roi_impl_auto(features) -> str:
    """Implementation choice when POET_ROI_IMPL is unset/auto.

    The Pallas kernel stages one image's whole pyramid in VMEM, so it is
    eligible only on TPU and only when the (padded) levels fit the ~16 MB
    budget alongside its scratch/output blocks (production bf16 pyramids
    are ~13 MB; f32 at full scale does not fit and takes the slab path)."""
    if jax.default_backend() != "tpu":
        return "slab"
    from poet_tpu.ops import roi_align_pallas as rap

    C = features[0].shape[-1]
    Cp = max(((C + 127) // 128) * 128, 8)
    bytes_ = sum(
        f.shape[1] * max(rap._ceil8(f.shape[2]), rap._level_rx(f.shape[2]))
        * Cp * f.dtype.itemsize
        for f in features
    )
    return "pallas" if bytes_ <= 13_500_000 else "slab"


def multiscale_roi_align_batched(
    features, strides, boxes, output_size: int = 7, sampling_ratio: int = 2,
    canonical_scale: int = 224, canonical_level: int = 4, window: int = 64,
    wide_capacity: int = 64, impl: str = None,
):
    """Batched MultiScaleRoIAlign dispatcher: per-level (B, H_l, W_l, C)
    features + (B, R, 4) boxes -> (B, R, out, out, C).

    impl (or POET_ROI_IMPL): 'pallas' = VMEM-resident-pyramid kernel
    (roi_align_pallas.py — the TPU production path), 'slab' = XLA
    slab-gather + MXU interpolation (below; also the pallas path's exact
    wide-box fallback), 'auto' (default) = pallas on TPU when the pyramid
    fits VMEM, slab otherwise."""
    impl = impl or os.environ.get("POET_ROI_IMPL", "auto")
    if impl == "auto":
        impl = _roi_impl_auto(features)
    if impl == "pallas":
        from poet_tpu.ops.roi_align_pallas import multiscale_roi_align_pallas

        return multiscale_roi_align_pallas(
            features, strides, boxes, output_size=output_size,
            sampling_ratio=sampling_ratio, canonical_scale=canonical_scale,
            canonical_level=canonical_level)
    return _multiscale_roi_align_slab_batched(
        features, strides, boxes, output_size=output_size,
        sampling_ratio=sampling_ratio, canonical_scale=canonical_scale,
        canonical_level=canonical_level, window=window,
        wide_capacity=wide_capacity)


def _multiscale_roi_align_slab_batched(
    features, strides, boxes, output_size: int = 7, sampling_ratio: int = 2,
    canonical_scale: int = 224, canonical_level: int = 4, window: int = 64,
    wide_capacity: int = 64,
):
    """Batched slab-gather RoIAlign: per-level (B, H_l, W_l, C) features +
    (B, R, 4) boxes -> (B, R, out, out, C).

    The WHOLE batch pools through one 2-D flat table (levels and batch both
    folded into the row offset): per (box, y-sample) the two bilinear corner
    ROWS are fetched as contiguous (window, C) slices (32 KB at production
    scale), and the full bilinear interpolation + x-bin averaging collapses
    into dot_generals against one-hot corner-weight tensors built from the
    exact torchvision (1-frac, frac) pairs.

    Batching by folding instead of vmap is deliberate: a vmapped
    single-image gather makes XLA batch the operand and pick a batch-INNER
    table layout ({2,0,1}), which destroys slab contiguity — measured as
    strided gathers at ~196 GB/s plus a 46 ms/iter relayout copy on the
    bs=16 detect+pose batch. The 2-D operand keeps rows contiguous and the
    gather emits the batched-matmul rhs layout directly.

    Exactness: with wx = min(xlo_first, W_l - window) the window covers every
    sample unless a box's x-span exceeds window-2 AND the box sits left of
    W_l - window (possible only on levels wider than the window — RPN
    slivers). The top-`wide_capacity` boxes PER IMAGE by coverage violation
    are re-pooled exactly with the window widened to the largest level
    width; >wide_capacity simultaneous slivers per image is the documented
    bound (property-tested in tests/test_detection_ops.py).
    """
    B, R = boxes.shape[:2]
    C = features[0].shape[-1]
    if R == 0:
        return jnp.zeros((B, 0, output_size, output_size, C), features[0].dtype)
    shapes = [(f.shape[1], f.shape[2]) for f in features]
    for li, (h, w_) in enumerate(shapes):
        if min(h, w_) < 2:
            raise ValueError(
                f"multiscale_roi_align: level {li} is {h}x{w_};"
                " every pyramid level needs H >= 2 and W >= 2 for bilinear"
                " corner gathers")
    boxes_flat = boxes.reshape(B * R, 4)
    lvl, H_arr, W_arr, W_int, inv_stride = _roi_level_geometry(
        shapes, strides, boxes_flat, canonical_scale, canonical_level)
    L = len(shapes)
    W0 = max(w_ for _, w_ in shapes)

    s = sampling_ratio
    N = output_size * s
    ii = jnp.arange(output_size, dtype=jnp.float32)
    kk = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    grid = (ii[:, None] + kk[None, :]).reshape(N)            # (N,)

    # one 2-D table: [level0 (B*H0*W0 rows), level1, ...]; row offset of
    # (image b, level l) = level base + b * level size
    sizes = [h * w_ for h, w_ in shapes]
    base = [B * sum(sizes[:i]) for i in range(L)]
    base_arr = jnp.asarray(base, jnp.int32)
    size_arr = jnp.asarray(sizes, jnp.int32)
    flat = jnp.concatenate([f.reshape(-1, C) for f in features], axis=0)
    flat = jnp.pad(flat, ((0, 2 * W0 + window), (0, 0)))
    dt = flat.dtype

    sc = inv_stride[lvl]
    boxes_lvl = boxes_flat.astype(jnp.float32) * sc[:, None]
    xlo, xfrac, x_out, ylo, yfrac, y_out = _roi_sample_coords(
        boxes_lvl, grid, output_size, H_arr[lvl], W_arr[lvl])
    Wl = W_int[lvl]                                          # (B*R,)
    img = jnp.arange(B * R, dtype=jnp.int32) // R
    row_start = (base_arr[lvl] + img * size_arr[lvl])[:, None] + ylo * Wl[:, None]
    wx = jnp.minimum(xlo[:, 0], jnp.maximum(Wl - window, 0))  # (B*R,)
    # window-coverage violation; 0 = the fast path is exact for this box
    over = jnp.maximum(xlo[:, -1] + 1 - (wx + window - 1), 0)

    def pool_boxes(xlo_c, xfrac_c, x_out_c, yfrac_c, y_out_c, row_c, wx_c,
                   wl_c, win):
        """Pool one group of boxes with an x-window of `win` feature px.

        Two (win, C) slab gathers per (box, y-sample) — one per bilinear
        corner ROW — each feeding its own dot_general. Keeping the corner
        rows in separate gathers lets XLA use the batched-matmul rhs layout
        straight off the gather; a single interleaved (2, win) K-dim
        measured a 46 ms/iter relayout copy at production scale."""
        r = xlo_c.shape[0]
        iota = jnp.arange(win)
        # x-corner weights per x-sample m, placed in window coords: (r, N, win)
        pos = xlo_c - wx_c[:, None]
        one_lo = (iota[None, None, :] == pos[..., None]).astype(jnp.float32)
        one_hi = (iota[None, None, :] == pos[..., None] + 1).astype(jnp.float32)
        xw = one_lo * (1.0 - xfrac_c[..., None]) + one_hi * xfrac_c[..., None]
        xw = xw * (~x_out_c)[..., None].astype(jnp.float32)
        # fold the s x-samples of each output bin (mean): (r, out_x, win)
        xw_bin = xw.reshape(r, output_size, s, win).mean(2)
        # y-corner weights per y-sample n, zeroed outside samples
        ymask = (~y_out_c).astype(jnp.float32)
        yl = ((1.0 - yfrac_c) * ymask)[:, :, None, None]     # (r, N, 1, 1)
        yh = (yfrac_c * ymask)[:, :, None, None]
        X_lo = (yl * xw_bin[:, None]).astype(dt)             # (r, n, out_x, win)
        X_hi = (yh * xw_bin[:, None]).astype(dt)
        start_lo = row_c + wx_c[:, None]                     # (r, N)
        G_lo = _gather_slabs(flat, start_lo, win)            # (r, N, win, C)
        G_hi = _gather_slabs(flat, start_lo + wl_c[:, None], win)
        dn = (((3,), (2,)), ((0, 1), (0, 1)))
        acc = jnp.float32 if dt == jnp.float32 else dt
        out = (lax.dot_general(X_lo, G_lo, dn, preferred_element_type=acc)
               + lax.dot_general(X_hi, G_hi, dn, preferred_element_type=acc))
        # fold the s y-samples of each output bin (mean)
        out = out.reshape(r, output_size, s, output_size, C).mean(2)
        return out.astype(dt)

    BR = B * R
    chunk = max(1, min(1024, BR))
    pad = (-BR) % chunk

    def cpad(x, fill=0):
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    def csplit(x):
        return x.reshape((-1, chunk) + x.shape[1:])

    args = tuple(
        csplit(cpad(a, fill))
        for a, fill in (
            (xlo, 0), (xfrac, 0.0), (x_out, False), (yfrac, 0.0),
            (y_out, False), (row_start, 0), (wx, 0), (Wl, 1),
        )
    )
    out = lax.map(lambda a: pool_boxes(*a, window), args)    # (n, chunk, o, o, C)
    out = out.reshape(-1, output_size, output_size, C)[:BR]

    # ---- exact full-width re-pool of window-violating ("wide") boxes -------
    # Same pooling code with the window widened to the largest level width
    # and wx = 0: pos = xlo <= W_l - 2 <= W0 - 2 always fits, so this path
    # is exact for ANY box geometry. Only the top-`wide_capacity` boxes per
    # image by coverage violation need it; their results overwrite the fast
    # ones (unconditionally — for covered boxes both paths agree exactly).
    if wide_capacity > 0 and W0 > window:
        Kw = min(wide_capacity, R)
        _, wide_img_i = lax.top_k(over.reshape(B, R), Kw)    # (B, Kw)
        wide_i = (jnp.arange(B, dtype=jnp.int32)[:, None] * R
                  + wide_img_i).reshape(-1)                  # (B*Kw,)
        out_w = pool_boxes(
            xlo[wide_i], xfrac[wide_i], x_out[wide_i], yfrac[wide_i],
            y_out[wide_i], row_start[wide_i],
            jnp.zeros(B * Kw, jnp.int32), Wl[wide_i], W0,
        )
        out = out.at[wide_i].set(out_w)
    return out.reshape(B, R, output_size, output_size, C)


def _multiscale_roi_align_slab(
    features, strides, boxes, output_size, sampling_ratio,
    canonical_scale, canonical_level, window: int = 64,
    wide_capacity: int = 64,
):
    """Single-image view of the slab path (B = 1)."""
    out = _multiscale_roi_align_slab_batched(
        [f[None] for f in features], strides, boxes[None],
        output_size=output_size, sampling_ratio=sampling_ratio,
        canonical_scale=canonical_scale, canonical_level=canonical_level,
        window=window, wide_capacity=wide_capacity)
    return out[0]


def _multiscale_roi_align_flat(
    features, strides, boxes, output_size, sampling_ratio,
    canonical_scale, canonical_level,
):
    """Corner-gather RoIAlign over the flat concatenated pyramid (oracle).

    One 512-byte row gather per bilinear corner — profiled at ~6% HBM
    bandwidth at production scale (the r2 detect+pose bottleneck); kept as
    the structurally-independent cross-check for the slab path and reachable
    via POET_ROI_IMPL=flat."""
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
