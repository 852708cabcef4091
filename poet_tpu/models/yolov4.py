"""YOLOv4-CSP backbone: darknet-cfg-driven network + detection head (flax).

TPU-native equivalent of the reference's external Scaled-YOLOv4 wrapper
(N8 in SURVEY §2.2; selected via --backbone yolov4, main.py:53, cfg at
configs/ycbv_yolov4-csp.cfg, drop-in documented at README.md:105-107). The
reference repo itself only ships the darknet cfg — the wrapper (aau-cns/yolov4,
ScaledYOLOv4-based) is external — so this module:

  * parses the darknet cfg into a static layer graph,
  * executes it in flax: convolutional (+frozen BN + mish/leaky/linear),
    route (concat), shortcut (add), maxpool (SPP, stride 1), upsample,
  * decodes the three yolo heads with the ScaledYOLOv4/u5 box decode
    (xy = (2σ(t) − 0.5 + grid)·stride, wh = (2σ(t))²·anchor — the decode the
    reference wrapper's PyTorch code uses; the classic darknet decode,
    honoring the cfg's scale_x_y with exp-wh, is available via
    box_decode='darknet' / --yolo_box_decode darknet),
  * applies confidence threshold + (optionally class-agnostic) NMS with
    static shapes,
  * exposes the three CSP-PAN feature maps (strides 8/16/32) for PoET.

The fused "mish-cuda" dependency (N2) is just `mish()` here — XLA fuses the
tanh/softplus chain into surrounding ops on TPU.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from poet_tpu.models.resnet_fpn import FrozenBatchNorm, downsample_mask
from poet_tpu.ops.detection import batched_class_nms, nms_padded


def mish(x):
    """Mish activation (x * tanh(softplus(x))) — replaces mish-cuda (N2).

    Computed via the exact algebraic rewrite
        tanh(log1p(e^x)) = 1 - 2 / ((1 + e^x)^2 + 1)
    — one exp + one divide instead of three transcendental passes
    (exp, log1p, tanh). Matches the textbook form to 2e-6 abs in f32
    (`tests/test_yolov4.py::test_mish_fast_rewrite`). This matters on TPU:
    mish runs on the VPU over the largest feature maps in the network (the
    stride-1/2 CSP stem sees 480x640x32 per image), where transcendental
    issue rate — not HBM — was the measured cost. x is clamped at 25
    before the exp (tanh(softplus(25)) == 1 in f32) so both the value and
    the autodiff gradient stay finite at any input.

    Measured footnote (2026-08-20, trimmed YOLO bench): keep the final
    `where` — a clamp-only variant (x * t(min(x, 25)), algebraically the
    same) benched 334 vs 404 img/s because XLA then fuses the divide chain
    INTO the big early-conv fusions, stretching their critical pass; the
    where keeps mish a separate lean pass. Pure x*tanh(softplus(x))
    benched 390."""
    xs = jnp.minimum(x, 25.0)
    e = jnp.exp(xs)
    t = 1.0 - 2.0 / ((1.0 + e) * (1.0 + e) + 1.0)
    return jnp.where(x > 25.0, x, x * t)


def parse_darknet_cfg(text: str) -> List[Dict[str, Any]]:
    """Parse a darknet .cfg into a list of {type, **options} dicts."""
    sections: List[Dict[str, Any]] = []
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#") or line.startswith(";"):
            continue
        if line.startswith("["):
            sections.append({"type": line.strip("[]")})
        else:
            k, _, v = line.partition("=")
            sections[-1][k.strip()] = v.strip()
    return sections


def _ints(s: str) -> List[int]:
    return [int(t) for t in re.split(r"[,\s]+", s.strip()) if t]


class _Stride2ConvS2D(nn.Module):
    """EXACT space-to-depth rewrite of a 3x3/stride-2 darknet conv.

    The r4 YOLO profile showed XLA lowering the early small-C stride-2 convs
    at ~25x their MAC+HBM roofline (6.4 ms/iter for 32->64 at 480x640: the
    chosen layout puts BATCH in sublanes and the 64 channels in half-empty
    lanes). Folding the 2x2 stride phases into channels gives XLA a
    stride-1 2x2 conv with 4*C input channels (full lanes) instead.

    Algebra (exact, not an approximation): with input blocks
    inp2[y', x', (py, px, c)] = in[2y'+py, 2x'+px, c] and the original 3x3
    taps dy = 2ky' + py - 1 (same for x), a 2x2 stride-1 conv over inp2
    with top/left-only padding covers every tap; the (ky'=0, py=0) quadrant
    has no matching dy and carries ZERO weights. The param keeps the
    darknet (3, 3, C, O) kernel layout, so .weights import and checkpoints
    are unchanged; the rearrangement streams at apply time (tiny).
    """

    features: int
    use_bias: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, C, self.features))
        w2 = jnp.zeros((2, 2, 2, 2, C, self.features), k.dtype)
        for ky in range(2):
            for py in range(2):
                dy = 2 * ky + py - 1
                if not 0 <= dy < 3:
                    continue
                for kx in range(2):
                    for px in range(2):
                        dx = 2 * kx + px - 1
                        if not 0 <= dx < 3:
                            continue
                        w2 = w2.at[ky, kx, py, px].set(k[dy, dx])
        w2 = w2.reshape(2, 2, 4 * C, self.features)

        x2 = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
        dt = self.dtype
        y = jax.lax.conv_general_dilated(
            x2.astype(dt), w2.astype(dt), window_strides=(1, 1),
            padding=[(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros_init(),
                           (self.features,))
            y = y + b.astype(dt)
        return y


class _ConvParams(nn.Module):
    """Param holder matching nn.Conv's tree (<name>/kernel [+ /bias]) so
    darknet .weights import and checkpoints are identical whichever conv
    implementation runs."""

    shape: Tuple[int, ...]
    use_bias: bool

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), self.shape)
        b = (self.param("bias", nn.initializers.zeros_init(),
                        (self.shape[-1],)) if self.use_bias else None)
        return k, b


def _use_pallas_stem(size, stride, pad, act, x):
    """Early small-C convs (the CSP entry: 3x3/1 3->32, 3x3/2 32->64 at
    full resolution) go through the fused Pallas phase-split conv
    (ops/conv_stem_pallas.py) on a TPU backend: XLA lowers them at up to
    ~25x their roofline (the same small-C stem pathology as the ResNet 7x7
    — see that module's docstring). C <= 32 covers exactly the pathological
    layers; everything deeper has full lanes and stays with XLA.
    DEFAULT OFF (r4 on-chip state: the kernel is exact but its im2col tap
    moves are VPU-scatter-bound and lose to XLA in bf16) — opt-in with
    POET_YOLO_STEM=1 for A/Bs; POET_YOLO_STEM=interpret forces the path in
    Pallas interpret mode on any backend (CPU wiring tests)."""
    mode = os.environ.get("POET_YOLO_STEM", "0")
    if mode == "0":
        return False
    from poet_tpu.config import _default_backend_is_tpu

    if mode != "interpret" and not _default_backend_is_tpu():
        return False
    shape_ok = (size in (1, 3, 5, 7) and stride in (1, 2)
                and pad == size // 2
                and x.shape[3] <= 32
                and act in ("mish", "leaky", "linear"))
    if mode == "interpret":
        return shape_ok
    return shape_ok and x.shape[1] * x.shape[2] >= 128 * 128


def _use_s2d(size, stride, pad, x):
    """3x3/s2/pad1 convs on even, large spatial maps with C < 128 (the
    small-C layout pathology). DEFAULT OFF: the full 2-D s2d measured 12.5
    vs 5.7 ms/iter standalone on chip (2026-08-20) — the height-phase
    transpose of the input dominates, the same failure mode as the ResNet
    stem s2d variants (README negative-result section). Kept as an exact,
    tested opt-in (POET_YOLO_S2D=1) for future layout experiments."""
    return (os.environ.get("POET_YOLO_S2D", "0") == "1"
            and size == 3 and stride == 2 and pad == 1
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
            and x.shape[3] < 128)


class DarknetBody(nn.Module):
    """Executes the darknet graph; returns (yolo_inputs, yolo_specs, feature_maps).

    yolo_inputs: raw conv outputs feeding each [yolo] section.
    feature_maps: the conv outputs immediately BEFORE each yolo 1x1 conv
    (the CSP-PAN features PoET consumes).
    """

    sections: Tuple[Tuple[Tuple[str, Any], ...], ...]   # hashable cfg
    dtype: jnp.dtype = jnp.float32                      # conv compute dtype

    @nn.compact
    def __call__(self, x):
        sections = [dict(s) for s in self.sections]
        assert sections[0]["type"] == "net"
        x = x.astype(self.dtype)
        outputs: List[jnp.ndarray] = []
        yolo_inputs, yolo_specs, features = [], [], []
        li = 0
        for sec in sections[1:]:
            t = sec["type"]
            if t == "convolutional":
                filters = int(sec["filters"])
                size = int(sec["size"])
                stride = int(sec.get("stride", 1))
                pad = (size // 2) if int(sec.get("pad", 0)) else int(sec.get("padding", 0))
                bn = int(sec.get("batch_normalize", 0))
                act = sec.get("activation", "linear")
                if _use_pallas_stem(size, stride, pad, act, x):
                    from poet_tpu.ops.conv_stem_pallas import conv_stem_pallas

                    k, b = _ConvParams(
                        (size, size, x.shape[3], filters), use_bias=not bn,
                        name=f"conv_{li}")()
                    if bn:
                        inv, off = FrozenBatchNorm(
                            filters, name=f"bn_{li}").scale_offset()
                        k = k * inv.astype(k.dtype)
                        b = off if b is None else b + off
                    y = conv_stem_pallas(
                        x, k.astype(self.dtype), b,
                        stride=stride, padding=((pad, pad), (pad, pad)),
                        activation=None if act == "linear" else act,
                        interpret=os.environ.get(
                            "POET_YOLO_STEM") == "interpret")
                    x = y
                    outputs.append(x)
                    li += 1
                    continue
                if _use_s2d(size, stride, pad, x):
                    y = _Stride2ConvS2D(
                        filters, use_bias=not bn, dtype=self.dtype,
                        name=f"conv_{li}",
                    )(x)
                else:
                    y = nn.Conv(
                        filters, (size, size), strides=(stride, stride),
                        padding=[(pad, pad), (pad, pad)], use_bias=not bn,
                        dtype=self.dtype, name=f"conv_{li}",
                    )(x)
                if bn:
                    y = FrozenBatchNorm(filters, name=f"bn_{li}")(y)
                if act == "mish":
                    y = mish(y)
                elif act == "leaky":
                    y = jax.nn.leaky_relu(y, 0.1)
                elif act == "logistic":
                    y = jax.nn.sigmoid(y)
                elif act != "linear":
                    raise NotImplementedError(f"activation {act}")
                if (filters <= 64 and y.shape[1] * y.shape[2] >= 240 * 320
                        and os.environ.get("POET_YOLO_STEM_BARRIER", "1") == "1"):
                    # layout isolation for the small-C stem convs — exact
                    # (identity): scripts/bench_stem_chain.py measured the
                    # chained stem at 9.5 ms vs a 5.3 ms standalone sum
                    # because each conv's chosen layout poisons the next;
                    # barriers stop the cross-conv layout propagation
                    # (full-pyramid A/B: 127.2 -> 128.4 img/s). The exact
                    # batch-fold / width-s2d reformulations both measured
                    # worse (scripts/bench_stem_fold.py, documented
                    # negative); POET_YOLO_STEM_BARRIER=0 for A/Bs.
                    y = jax.lax.optimization_barrier(y)
                x = y
            elif t == "route":
                layers = _ints(sec["layers"])
                srcs = [outputs[i if i >= 0 else li + i] for i in layers]
                groups = int(sec.get("groups", 1))
                if groups > 1:
                    gid = int(sec.get("group_id", 0))
                    srcs = [
                        jnp.split(s, groups, axis=-1)[gid] for s in srcs
                    ]
                x = srcs[0] if len(srcs) == 1 else jnp.concatenate(srcs, axis=-1)
            elif t == "shortcut":
                frm = int(sec["from"])
                x = x + outputs[frm if frm >= 0 else li + frm]
                act = sec.get("activation", "linear")
                if act == "leaky":
                    x = jax.nn.leaky_relu(x, 0.1)
            elif t == "maxpool":
                size = int(sec.get("size", 2))
                stride = int(sec.get("stride", size))
                pad = size // 2
                x = nn.max_pool(
                    x, (size, size), strides=(stride, stride),
                    padding=[(pad, pad), (pad, pad)],
                )
            elif t == "upsample":
                s = int(sec.get("stride", 2))
                B, H, W, C = x.shape
                x = jax.image.resize(x, (B, H * s, W * s, C), "nearest")
            elif t == "yolo":
                yolo_inputs.append(x)
                features.append(outputs[li - 2])   # feature before the 1x1 head conv
                anchors = _ints(sec["anchors"])
                mask = _ints(sec["mask"])
                yolo_specs.append(
                    {
                        "anchors": [(anchors[2 * i], anchors[2 * i + 1]) for i in mask],
                        "classes": int(sec["classes"]),
                        "scale_x_y": float(sec.get("scale_x_y", 1.0)),
                        "new_coords": int(sec.get("new_coords", 0)),
                    }
                )
                x = outputs[-1]  # yolo is a leaf; keep graph pointer unchanged
            else:
                raise NotImplementedError(f"darknet section {t}")
            outputs.append(x)
            li += 1
        return yolo_inputs, yolo_specs, features


def decode_yolo_u5(raw: jnp.ndarray, anchors, num_classes: int, stride: int):
    """ScaledYOLOv4 (PyTorch/u5) decode for one head.

    raw: (B, H, W, A*(5+nc)) -> boxes (B, H*W*A, 4) xyxy pixels,
    obj*cls scores (B, H*W*A, nc).

    This is the decode the reference's external PyTorch wrapper applies
    (xy = (2σ−0.5+grid)·stride, wh = (2σ)²·anchor) regardless of the cfg's
    scale_x_y — and also exactly what darknet computes for new_coords=1 /
    scale_x_y=2 cfgs. Weights trained with CLASSIC darknet (new_coords=0)
    need decode_yolo_darknet instead (box_decode='darknet').
    """
    B, H, W, _ = raw.shape
    A = len(anchors)
    raw = raw.reshape(B, H, W, A, 5 + num_classes)
    xy = jax.nn.sigmoid(raw[..., 0:2])
    wh = jax.nn.sigmoid(raw[..., 2:4])
    obj = jax.nn.sigmoid(raw[..., 4:5])
    cls = jax.nn.sigmoid(raw[..., 5:])
    gx = jnp.arange(W, dtype=raw.dtype)
    gy = jnp.arange(H, dtype=raw.dtype)
    grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)  # (H, W, 2)
    xy = (xy * 2.0 - 0.5 + grid[None, :, :, None, :]) * stride
    anc = jnp.asarray(anchors, raw.dtype)                            # (A, 2)
    wh = (wh * 2.0) ** 2 * anc[None, None, None, :, :]
    boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
    scores = obj * cls
    return boxes.reshape(B, H * W * A, 4), scores.reshape(B, H * W * A, num_classes)


def decode_yolo_darknet(raw: jnp.ndarray, anchors, num_classes: int,
                        stride: int, scale_x_y: float = 1.0):
    """Classic darknet (AlexeyAB, new_coords=0) decode for one head:
    xy = (σ·s − (s−1)/2 + grid)·stride with s = the cfg's scale_x_y,
    wh = exp(t)·anchor. For weights trained with darknet itself against a
    cfg like configs/ycbv_yolov4-csp.cfg (scale_x_y=1.05)."""
    B, H, W, _ = raw.shape
    A = len(anchors)
    raw = raw.reshape(B, H, W, A, 5 + num_classes)
    xy = jax.nn.sigmoid(raw[..., 0:2]) * scale_x_y - (scale_x_y - 1.0) / 2.0
    # clip like darknet's box_w bound to avoid inf from untrained logits
    wh = jnp.exp(jnp.clip(raw[..., 2:4], -20.0, 20.0))
    obj = jax.nn.sigmoid(raw[..., 4:5])
    cls = jax.nn.sigmoid(raw[..., 5:])
    gx = jnp.arange(W, dtype=raw.dtype)
    gy = jnp.arange(H, dtype=raw.dtype)
    grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)  # (H, W, 2)
    xy = (xy + grid[None, :, :, None, :]) * stride
    anc = jnp.asarray(anchors, raw.dtype)                            # (A, 2)
    wh = wh * anc[None, None, None, :, :]
    boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
    scores = obj * cls
    return boxes.reshape(B, H * W * A, 4), scores.reshape(B, H * W * A, num_classes)


class YOLOv4Backbone(nn.Module):
    """Full YOLOv4-CSP backbone for PoET.

    Returns (features, masks, detections):
      features: 3 CSP-PAN maps (strides 8/16/32, channels-last),
      detections: fixed-size {boxes, scores, labels, valid} after
      conf-threshold + NMS; labels are category ids (class index + 1, the
      PoET dataset convention where 0 = background).
    """

    cfg_sections: Tuple[Tuple[Tuple[str, Any], ...], ...]
    conf_thresh: float = 0.4
    iou_thresh: float = 0.5
    agnostic_nms: bool = False
    max_detections: int = 100
    pre_nms: int = 512
    train_backbone: bool = False
    # Feature maps with stride < encoder_min_stride are decoded for
    # detections but NOT returned as transformer inputs (TPU-first option;
    # see BackboneConfig.encoder_min_stride). 1 = reference behavior.
    encoder_min_stride: int = 1
    # 'u5' (default) = the reference wrapper's PyTorch decode;
    # 'darknet' = classic darknet new_coords=0 decode honoring the cfg's
    # per-head scale_x_y, for weights trained with darknet itself.
    box_decode: str = "u5"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, pad_mask: jnp.ndarray):
        yolo_inputs, yolo_specs, features = DarknetBody(
            self.cfg_sections, dtype=self.dtype, name="body"
        )(images)
        if not self.train_backbone:
            yolo_inputs = [jax.lax.stop_gradient(y) for y in yolo_inputs]
            features = [jax.lax.stop_gradient(f) for f in features]

        B = images.shape[0]
        img_h = images.shape[1]
        all_boxes, all_scores = [], []
        for raw, spec in zip(yolo_inputs, yolo_specs):
            stride = img_h // raw.shape[1]
            # decode/score/NMS in f32 for ranking stability
            if self.box_decode == "darknet":
                boxes, scores = decode_yolo_darknet(
                    raw.astype(jnp.float32), spec["anchors"], spec["classes"],
                    stride, scale_x_y=spec["scale_x_y"],
                )
            else:
                boxes, scores = decode_yolo_u5(
                    raw.astype(jnp.float32), spec["anchors"], spec["classes"],
                    stride,
                )
            all_boxes.append(boxes)
            all_scores.append(scores)
        boxes = jnp.concatenate(all_boxes, axis=1)        # (B, N, 4)
        scores = jnp.concatenate(all_scores, axis=1)      # (B, N, nc)

        best_score = jnp.max(scores, axis=-1)             # (B, N)
        best_cls = jnp.argmax(scores, axis=-1).astype(jnp.int32)

        # vmapped over the batch: one traced instance of top-k + NMS
        def detect_one(boxes_b, best_score_b, best_cls_b):
            s = jnp.where(best_score_b > self.conf_thresh, best_score_b, -jnp.inf)
            k = min(self.pre_nms, s.shape[0])
            top_s, top_i = jax.lax.top_k(s, k)
            cand_boxes = boxes_b[top_i]
            cand_labels = best_cls_b[top_i] + 1            # category ids
            valid = jnp.isfinite(top_s)
            if self.agnostic_nms:
                keep_idx, keep_valid = nms_padded(
                    cand_boxes, jnp.where(valid, top_s, -jnp.inf),
                    self.iou_thresh, self.max_detections,
                )
            else:
                keep_idx, keep_valid = batched_class_nms(
                    cand_boxes, top_s, cand_labels, valid,
                    self.iou_thresh, self.max_detections,
                )
            return {
                "boxes": cand_boxes[keep_idx],
                "scores": jnp.where(keep_valid, top_s[keep_idx], 0.0),
                "labels": jnp.where(keep_valid, cand_labels[keep_idx], -1),
                "valid": keep_valid,
            }

        detections = jax.vmap(detect_one)(boxes, best_score, best_cls)
        if self.encoder_min_stride > 1:
            features = [f for f in features
                        if img_h // f.shape[1] >= self.encoder_min_stride]
            assert features, "encoder_min_stride dropped every feature map"
        masks = [downsample_mask(pad_mask, f.shape[1:3]) for f in features]
        return features, masks, detections


def load_cfg_sections(path: str):
    """Read + freeze a darknet cfg into a hashable structure for flax."""
    with open(path) as f:
        sections = parse_darknet_cfg(f.read())
    return tuple(tuple(sorted(s.items())) for s in sections)
