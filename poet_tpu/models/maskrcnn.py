"""Mask R-CNN detection path (RPN + RoI heads) — static-shape, flax.

TPU-native equivalent of the torchvision detection stack the reference drives
manually in models/backbone_maskrcnn.py:59-116 (anchors -> RPN head -> decode
-> filter_proposals -> roi_heads -> per-image [x1, y1, x2, y2, score, label]
rows). Naming/structure mirror torchvision so its checkpoints port 1:1:

  rpn.head.conv / cls_logits / bbox_pred
  roi_heads.box_head.fc6 / fc7, roi_heads.box_predictor.cls_score / bbox_pred

All shape-dynamic torchvision ops (per-level top-k, NMS, per-class filtering)
become fixed-size candidate sets with validity masks (poet_tpu.ops.detection).
Inference-only: the reference always runs the detector frozen in eval mode
(models/backbone.py:36-40); RPN/RoI training losses are out of parity scope.
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from poet_tpu.ops.detection import (
    batched_class_nms,
    class_nms_select_pruned,
    exact_class_nms_mask,
    multiscale_roi_align,
    multiscale_roi_align_batched,
    nms_padded,
)

# torchvision GeneralizedRCNN defaults (used by MaskRCNN in the reference)
ANCHOR_SIZES = ((32,), (64,), (128,), (256,), (512,))
ASPECT_RATIOS = (0.5, 1.0, 2.0)
PRE_NMS_TOP_N = 1000
POST_NMS_TOP_N = 1000
RPN_NMS_THRESH = 0.7
RPN_MIN_SIZE = 1e-3
BOX_SCORE_THRESH = 0.05
BOX_NMS_THRESH = 0.5
DETECTIONS_PER_IMG = 100
BBOX_XFORM_CLIP = math.log(1000.0 / 16)


def generate_anchors(grid_sizes, strides, sizes=ANCHOR_SIZES, ratios=ASPECT_RATIOS):
    """Per-level anchor grids (numpy, static). torchvision AnchorGenerator:
    h = s*sqrt(r), w = s/sqrt(r), rounded base anchors centered at 0, shifted
    by stride * (x, y). `strides` entries may be scalars or (sy, sx) pairs
    (torchvision computes them per axis: image_size // grid_size)."""
    all_anchors = []
    for (gh, gw), stride, size in zip(grid_sizes, strides, sizes):
        sy_stride, sx_stride = stride if isinstance(stride, (tuple, list)) else (stride, stride)
        s = np.asarray(size, dtype=np.float32)
        r = np.asarray(ratios, dtype=np.float32)
        h_r = np.sqrt(r)
        w_r = 1.0 / h_r
        ws = (w_r[:, None] * s[None, :]).reshape(-1)
        hs = (h_r[:, None] * s[None, :]).reshape(-1)
        base = np.stack([-ws, -hs, ws, hs], axis=1) / 2.0
        base = np.round(base)
        sx = np.arange(gw, dtype=np.float32) * sx_stride
        sy = np.arange(gh, dtype=np.float32) * sy_stride
        yy, xx = np.meshgrid(sy, sx, indexing="ij")
        shifts = np.stack([xx, yy, xx, yy], axis=-1).reshape(-1, 1, 4)
        anchors = (shifts + base[None]).reshape(-1, 4)
        all_anchors.append(anchors.astype(np.float32))
    return all_anchors


def decode_boxes(deltas: jnp.ndarray, anchors: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """torchvision BoxCoder.decode: deltas (N, 4) + anchors (N, 4) xyxy."""
    wx, wy, ww, wh = weights
    widths = anchors[:, 2] - anchors[:, 0]
    heights = anchors[:, 3] - anchors[:, 1]
    cx = anchors[:, 0] + 0.5 * widths
    cy = anchors[:, 1] + 0.5 * heights
    dx = deltas[:, 0] / wx
    dy = deltas[:, 1] / wy
    dw = jnp.clip(deltas[:, 2] / ww, None, BBOX_XFORM_CLIP)
    dh = jnp.clip(deltas[:, 3] / wh, None, BBOX_XFORM_CLIP)
    pcx = dx * widths + cx
    pcy = dy * heights + cy
    pw = jnp.exp(dw) * widths
    ph = jnp.exp(dh) * heights
    return jnp.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], axis=1
    )


def clip_boxes(boxes: jnp.ndarray, image_size) -> jnp.ndarray:
    H, W = image_size
    x = jnp.clip(boxes[:, 0::2], 0, W)
    y = jnp.clip(boxes[:, 1::2], 0, H)
    return jnp.stack([x[:, 0], y[:, 0], x[:, 1], y[:, 1]], axis=1)


class RPNHead(nn.Module):
    """torchvision RPNHead: shared 3x3 conv + 1x1 objectness / deltas.

    `dtype` is the conv compute dtype. At the default f32 this matches the
    torch oracle bit-for-bit; bf16 is the production setting (the heads are
    the detect+pose path's biggest f32 block — the shared 3x3 over the
    stride-4 level alone is ~2.8e11 MAC/batch, and f32 runs the MXU at a
    fraction of its bf16 rate; the reference's own deployed figure is
    TensorRT fp16, README.md:35). Box decode / scoring / NMS stay f32
    downstream either way."""

    num_anchors: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]):
        conv = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], name="conv",
                       dtype=self.dtype)
        cls = nn.Conv(self.num_anchors, (1, 1), name="cls_logits",
                      dtype=self.dtype)
        reg = nn.Conv(self.num_anchors * 4, (1, 1), name="bbox_pred",
                      dtype=self.dtype)
        logits, deltas = [], []
        for f in feats:
            t = nn.relu(conv(f))
            logits.append(cls(t).astype(jnp.float32))
            deltas.append(reg(t).astype(jnp.float32))
        return logits, deltas


class _FC(nn.Module):
    """Dense params (kernel/bias) without a fixed input-flatten order —
    same tree layout and initializers as nn.Dense so checkpoints port 1:1."""

    features: int
    in_features: int

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features))
        self.bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,))


class TwoMLPHead(nn.Module):
    """torchvision TwoMLPHead (fc6/fc7, 1024 each).

    `padded_in=(Hp, Wp, Cp, C)` consumes pooled features in the Pallas RoI
    align's native padded (N, Hp, Wp, Cp) HWC block (pad positions exact
    zeros) by permuting + zero-padding the fc6 kernel to match — the
    product is bit-identical to slicing/transposing the input to
    torchvision's (C, out, out) flatten (zero rows contribute zero), but
    skips the input-side slice/transpose copies on 16k RoIs/batch. The
    param keeps torchvision's (C*out*out, 1024) shape, so checkpoint import
    is unchanged; the (25 MB bf16) kernel rearrangement streams once per
    forward, amortized over the 16000-row matmul."""

    padded_in: Tuple[int, int, int, int] = None
    output_size: int = 7          # must equal the RoI align's output_size
    # compute dtype: None = flax-style promotion (f32 with f32 params — the
    # torch-oracle parity setting); bf16 = production (the 16k-RoI fc6/fc7
    # matmuls are the RoI path's dominant MACs and f32 wastes the MXU)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.padded_in is None:
            x = x.reshape(x.shape[0], -1)
            x = nn.relu(nn.Dense(1024, name="fc6", dtype=self.dtype)(x))
        else:
            Hp, Wp, Cp, C = self.padded_in
            o = self.output_size
            assert o <= min(Hp, Wp), (
                f"output_size {o} exceeds padded pooled block {Hp}x{Wp}")
            fc6 = _FC(1024, C * o * o, name="fc6")
            assert fc6.kernel.shape[0] == C * o * o, (
                f"fc6 kernel input dim {fc6.kernel.shape[0]} != C*o*o "
                f"({C}*{o}*{o}) — output_size mismatch vs the RoI align")
            w = fc6.kernel.reshape(C, o, o, 1024)              # (C,7,7) order
            w = jnp.transpose(w, (1, 2, 0, 3))                 # (7,7,C,1024)
            w = jnp.pad(w, ((0, Hp - o), (0, Wp - o), (0, Cp - C), (0, 0)))
            # nn.Dense dtype promotion: inputs/params promote jointly
            dt = (self.dtype if self.dtype is not None
                  else jnp.promote_types(x.dtype, fc6.kernel.dtype))
            x = x.reshape(x.shape[0], Hp, Wp, Cp).astype(dt)
            if os.environ.get("POET_FC6_CONV", "1") == "1":
                # Express fc6 as an (Hp, Wp) VALID convolution over the
                # pooled block (batch = RoIs, C minor — the Pallas RoI
                # align's NATIVE output layout). Identical contraction; the
                # r5 xplane profile showed the dot_general formulation
                # below still paying a 1.7 ms/iter relayout copy at 16k
                # RoIs because the dot's chosen lhs layout puts the RoI
                # axis minor, while the conv lowering consumes C-minor
                # NHWC directly.
                y = jax.lax.conv_general_dilated(
                    x, w.astype(dt), window_strides=(1, 1),
                    padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                x = y.reshape(y.shape[0], y.shape[-1])
            else:
                # contract the (Hp, Wp, Cp) block axes directly: dot_general
                # with three contracting dims lets XLA fold the flatten into
                # the matmul instead of materializing a (N, Hp*Wp*Cp)
                # relayout copy (tiled TPU layouts of the 5-D block and the
                # 2-D matrix differ physically — the reshape measured
                # 1.6 ms/iter at 16k RoIs)
                x = jax.lax.dot_general(
                    x, w.astype(dt),
                    dimension_numbers=(((1, 2, 3), (0, 1, 2)), ((), ())))
            x = nn.relu(x + fc6.bias.astype(dt))
        x = nn.relu(nn.Dense(1024, name="fc7", dtype=self.dtype)(x))
        return x


class FastRCNNPredictor(nn.Module):
    num_classes: int
    dtype: Any = None       # None = promotion (f32); bf16 = production

    @nn.compact
    def __call__(self, x):
        # scores/deltas feed f32 softmax + box decode + NMS ranking
        scores = nn.Dense(self.num_classes, name="cls_score",
                          dtype=self.dtype)(x).astype(jnp.float32)
        deltas = nn.Dense(self.num_classes * 4, name="bbox_pred",
                          dtype=self.dtype)(x).astype(jnp.float32)
        return scores, deltas


class MaskRCNNDetector(nn.Module):
    """RPN + box RoI heads over FPN features; per-image fixed-size detections.

    __call__ consumes the FPN level dict {'0'..'3', 'pool'} (channels-last)
    and returns {boxes (B, K, 4) xyxy, scores (B, K), labels (B, K) int32,
    valid (B, K)} with K = max_detections.
    """

    num_classes: int
    max_detections: int = DETECTIONS_PER_IMG
    score_thresh: float = BOX_SCORE_THRESH
    nms_thresh: float = BOX_NMS_THRESH
    post_nms_top_n: int = POST_NMS_TOP_N
    # final-NMS candidate policy. None or 0 (the production default) =
    # EXACT per-class suppression of the FULL P*ncls set (torchvision
    # batched_nms semantics, ops/detection.py:exact_class_nms_mask — per
    # class the IoU matrix is only (P, P), so exactness needs no cap).
    # A positive value restores the score-top-k cap (one small IoU matrix)
    # as a perf knob; its saturation CAN change detections vs exact
    # (adversarial near-tied clusters) — covered by tests.
    nms_candidates: int = None
    # exact-NMS fast path: size of the certified score-pruned candidate set
    # (class_nms_select_pruned). Output is exact regardless of the value —
    # it only trades the fast path's width against how often the whole-batch
    # exact fallback triggers. 0 disables pruning (always full suppression).
    nms_prune_k: int = 1024
    # anchor sizes per FPN level, from the rcnn YAML `anchor_sizes` key
    # (parity: backbone_maskrcnn.py:26-33 builds the AnchorGenerator from it)
    anchor_sizes: Tuple[Tuple[int, ...], ...] = ANCHOR_SIZES
    # head conv/matmul compute dtype (RPN convs, fc6/fc7, predictor). None =
    # flax promotion (f32 with f32 params — the torch-oracle parity setting,
    # bit-matched by tests/test_detector_numeric_parity.py). bf16 = the
    # production setting (r5): the RPN 3x3 over the stride-4 level and the
    # 16k-RoI fc6/fc7 are the detect+pose path's dominant MACs and were
    # silently running at f32 MXU rates. ALL ranking arithmetic — objectness
    # top-k, box decode, score softmax, NMS — stays f32 downstream (the
    # heads emit f32) in both settings.
    dtype: Any = None

    @nn.compact
    def __call__(self, fpn_feats: Dict[str, jnp.ndarray], image_size: Tuple[int, int],
                 pool_feats: Dict[str, jnp.ndarray] = None):
        """`fpn_feats` drive the RPN and all ranking arithmetic (callers pass
        f32 for score/NMS stability at dtype=None; at dtype=bf16 the RPN
        reads the native maps and only its OUTPUTS are f32). `pool_feats`,
        when given, are the same maps in the model's COMPUTE dtype and feed
        only RoIAlign + the box head — at bf16 that halves the dominant HBM
        traffic of the detector (the r2 profile's 245 ms corner gathers ran
        on upcast-f32 features) while box ranking stays f32."""
        levels = ["0", "1", "2", "3", "pool"]
        feats = [fpn_feats[k] for k in levels]
        roi_feats = [(pool_feats or fpn_feats)[k] for k in levels]
        if self.dtype is not None:
            # bf16 heads read the native maps — the caller's f32 upcast of
            # the stride-4 pyramid (~470 MB/batch of copy traffic) is unused
            feats = roi_feats
        B = feats[0].shape[0]
        grid_sizes = [f.shape[1:3] for f in feats]
        # torchvision computes strides per axis: image_size // grid_size
        strides = [(image_size[0] // g[0], image_size[1] // g[1]) for g in grid_sizes]
        n_anchors = len(self.anchor_sizes[0]) * len(ASPECT_RATIOS)

        logits, deltas = RPNHead(n_anchors, name="rpn_head",
                                 dtype=self.dtype or jnp.float32)(feats)
        anchors = [
            jnp.asarray(a)
            for a in generate_anchors(grid_sizes, strides, sizes=self.anchor_sizes)
        ]

        # ---- proposals, vmapped over the batch (ONE traced program instance;
        # the reference drives torchvision's batched filter_proposals,
        # backbone_maskrcnn.py:90)
        def proposals_one(lg, dl):
            # lg/dl: per-level tuples for a single image

            lvl_boxes, lvl_scores = [], []
            for lv in range(len(levels)):
                obj = lg[lv].reshape(-1)                       # (H*W*A,)
                dts = dl[lv].reshape(-1, 4)
                anc = anchors[lv]
                k = min(PRE_NMS_TOP_N, obj.shape[0])
                top_scores, top_i = jax.lax.top_k(obj, k)
                boxes = decode_boxes(dts[top_i], anc[top_i])
                boxes = clip_boxes(boxes, image_size)
                ws = boxes[:, 2] - boxes[:, 0]
                hs = boxes[:, 3] - boxes[:, 1]
                valid = (ws >= RPN_MIN_SIZE) & (hs >= RPN_MIN_SIZE)
                scores = jnp.where(valid, top_scores, -jnp.inf)
                keep_idx, keep_valid = nms_padded(
                    boxes, scores, RPN_NMS_THRESH,
                    min(self.post_nms_top_n, k),
                )
                lvl_boxes.append(boxes[keep_idx])
                lvl_scores.append(jnp.where(keep_valid, scores[keep_idx], -jnp.inf))
            all_boxes = jnp.concatenate(lvl_boxes)
            all_scores = jnp.concatenate(lvl_scores)
            k = min(self.post_nms_top_n, all_scores.shape[0])
            top_scores, top_i = jax.lax.top_k(all_scores, k)
            return all_boxes[top_i], jnp.isfinite(top_scores)

        # reshape NHWC anchor-channel layout to torchvision's flatten
        # (grid-major, A minor) while keeping the batch axis
        def reflatten(x, per_anchor):
            Bb, Hh, Ww, _ = x.shape
            return x.reshape(Bb, Hh * Ww * n_anchors, per_anchor)

        lg = tuple(reflatten(logits[lv], 1) for lv in range(len(levels)))
        dl = tuple(reflatten(deltas[lv], 4) for lv in range(len(levels)))
        prop_boxes, prop_valid = jax.vmap(proposals_one)(lg, dl)  # (B, P, 4), (B, P)

        # ---- RoI heads (levels 0-3 only, torchvision MultiScaleRoIAlign).
        # RoI-align is vmapped; the MLP head + predictor then run ONCE over
        # the folded (B*P) batch — a single big matmul instead of B copies.
        sy_strides = [s[0] for s in strides]
        impl = os.environ.get("POET_ROI_IMPL", "auto")
        if impl == "auto":
            from poet_tpu.ops.detection import _roi_impl_auto

            impl = _roi_impl_auto(roi_feats[:4])
        if impl == "pallas":
            # Pallas VMEM-resident pyramid, consumed in its native padded
            # (Mo, Mo, Cp) block: the head's zero-padded fc6 kernel makes
            # the flatten exact without the 7x7xC slice + NCHW transpose
            from poet_tpu.ops.roi_align_pallas import multiscale_roi_align_pallas

            pooled = multiscale_roi_align_pallas(
                list(roi_feats[:4]), sy_strides[:4], prop_boxes,
                output_size=7, sampling_ratio=2, padded_output=True)
            P = pooled.shape[1]
            _, _, Mo, _, Cp = pooled.shape
            C_feat = roi_feats[0].shape[-1]
            x = TwoMLPHead(name="box_head", padded_in=(Mo, Mo, Cp, C_feat),
                           output_size=7, dtype=self.dtype)(
                pooled.reshape(B * P, -1))
        else:
            if impl == "flat":
                pooled = jax.vmap(
                    lambda fs, bx: multiscale_roi_align(
                        list(fs), sy_strides[:4], bx, output_size=7,
                        sampling_ratio=2)
                )(tuple(roi_feats[:4]), prop_boxes)            # (B, P, 7, 7, C)
            else:
                # the whole batch through ONE flat table — batch folded into
                # the row offsets, NOT vmapped (vmapping the gather makes XLA
                # pick a batch-inner table layout that destroys slab
                # contiguity; see multiscale_roi_align_batched)
                pooled = multiscale_roi_align_batched(
                    list(roi_feats[:4]), sy_strides[:4], prop_boxes,
                    output_size=7, sampling_ratio=2, impl=impl)  # (B,P,7,7,C)
            P = pooled.shape[1]
            # torchvision flattens NCHW: (C, 7, 7) order
            pooled = jnp.transpose(pooled, (0, 1, 4, 2, 3)).reshape(B * P, -1)
            x = TwoMLPHead(name="box_head", dtype=self.dtype)(pooled)
        class_logits, box_deltas = FastRCNNPredictor(
            self.num_classes, name="box_predictor", dtype=self.dtype
        )(x)
        ncls = self.num_classes
        scores = jax.nn.softmax(class_logits, axis=-1).reshape(B, P, ncls)
        box_deltas = box_deltas.reshape(B, P, ncls * 4)

        PN = P * ncls
        labels_pc = jnp.tile(jnp.arange(ncls), (P,))

        def decode_one(scores_b, deltas_b, prop_boxes_b, prop_valid_b):
            # decode per class (weights (10, 10, 5, 5))
            deltas_pc = deltas_b.reshape(PN, 4)
            anchors_pc = jnp.repeat(prop_boxes_b, ncls, axis=0)
            boxes_pc = decode_boxes(deltas_pc, anchors_pc, weights=(10.0, 10.0, 5.0, 5.0))
            boxes_pc = clip_boxes(boxes_pc, image_size)        # (P*ncls, 4)
            scores_pc = scores_b.reshape(PN)
            valid_pc = (
                (labels_pc > 0)                                 # drop background
                & (scores_pc > self.score_thresh)
                & jnp.repeat(prop_valid_b, ncls)
                & ((boxes_pc[:, 2] - boxes_pc[:, 0]) >= 1e-2)   # remove_small 0.01
                & ((boxes_pc[:, 3] - boxes_pc[:, 1]) >= 1e-2)
            )
            masked_scores = jnp.where(valid_pc, scores_pc, -jnp.inf)
            return boxes_pc, scores_pc, masked_scores

        boxes_pc, scores_pc, masked_scores = jax.vmap(decode_one)(
            scores, box_deltas, prop_boxes, prop_valid)        # (B, PN, ...)

        def exact_select(operand):
            bx, ms = operand

            def one(bx_b, ms_b):
                keep_mask = exact_class_nms_mask(
                    bx_b, ms_b, ncls, self.nms_thresh)
                top_s, sel = jax.lax.top_k(
                    jnp.where(keep_mask, ms_b, -jnp.inf), self.max_detections)
                keep_valid = jnp.isfinite(top_s)
                return jnp.where(keep_valid, sel, 0).astype(jnp.int32), keep_valid

            return jax.vmap(one)(bx, ms)

        if self.nms_candidates is None or self.nms_candidates == 0:
            # production default: EXACT per-class NMS (torchvision batched_nms
            # semantics over the full P*ncls set — VERDICT r2 weak #4). Fast
            # path: suppress only the global score-top-`nms_prune_k`
            # candidates, whose per-image exactness CERTIFICATE
            # (ops/detection.py:class_nms_select_pruned) proves the result
            # bit-identical; a whole-batch lax.cond falls back to the full
            # (P, P)-per-class suppression when any image's certificate
            # fails, so the output is exact ALWAYS — the certificate only
            # decides which program computes it.
            prune_k = self.nms_prune_k
            if prune_k and PN > prune_k > self.max_detections:
                def pruned_one(bx_b, ms_b):
                    return class_nms_select_pruned(
                        bx_b, ms_b, labels_pc, self.nms_thresh,
                        self.max_detections, prune_k)

                sel_p, valid_p, cert = jax.vmap(pruned_one)(
                    boxes_pc, masked_scores)
                sel, keep_valid = jax.lax.cond(
                    jnp.all(cert),
                    lambda _: (sel_p, valid_p),
                    exact_select,
                    (boxes_pc, masked_scores),
                )
            else:
                sel, keep_valid = exact_select((boxes_pc, masked_scores))
        else:
            # opt-in perf knob: suppress only the score-top-k candidates
            # WITHOUT the exactness fallback; its saturation can change
            # detections (adversarial near-tied clusters) — see
            # tests/test_detection_ops.py adversarial cap test.
            def capped_one(bx_b, ms_b):
                cand = min(self.nms_candidates, PN)
                cand_scores, cand_i = jax.lax.top_k(ms_b, cand)
                keep_idx, keep_valid = batched_class_nms(
                    bx_b[cand_i], cand_scores, labels_pc[cand_i],
                    jnp.isfinite(cand_scores), self.nms_thresh,
                    self.max_detections,
                )
                return cand_i[keep_idx], keep_valid

            sel, keep_valid = jax.vmap(capped_one)(boxes_pc, masked_scores)

        def gather_one(bx_b, sc_b, sel_b, valid_b):
            return {
                "boxes": bx_b[sel_b],
                "scores": jnp.where(valid_b, sc_b[sel_b], 0.0),
                "labels": jnp.where(valid_b, labels_pc[sel_b], -1).astype(jnp.int32),
                "valid": valid_b,
            }

        return jax.vmap(gather_one)(boxes_pc, scores_pc, sel, keep_valid)
