"""Backbone wrappers: frozen feature extractors + positional encodings.

Parity target: models/backbone.py (Joiner) + backbone_maskrcnn.py. The
reference forces the detector into eval mode and freezes every parameter
(backbone.py:36-40); here the freeze is a stop_gradient at the feature
boundary plus an optimizer mask over the 'backbone' param subtree — the JAX
equivalent of requires_grad_(False).
"""

from __future__ import annotations

import math as _math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from poet_tpu.models.resnet_fpn import ResNetFPN, downsample_mask
from poet_tpu.ops.embeddings import position_embedding_sine


class MaskRCNNDetectorBackbone(nn.Module):
    """ResNet-50-FPN features + RPN/RoI detections (one FPN pass).

    Full parity with MaskRCNNBackbone.forward (backbone_maskrcnn.py:59-126):
    returns PoET's feature levels ['2', '3', 'pool'] plus per-image
    fixed-size detections for bbox_mode='backbone' / inference. The LM-O raw
    object-id remap {1,5,6,8,9,10,11,12}->{1..8} (backbone_maskrcnn.py:55-57,
    101-107) is applied to detection labels; unmapped raw ids are dropped.
    """

    num_classes: int = 22           # incl. background (rcnn cfg label map)
    max_detections: int = 100
    post_nms_top_n: int = 1000
    obj_id_map: Optional[Tuple[Tuple[int, int], ...]] = None  # ((raw, new), ...)
    return_layers: Tuple[str, ...] = ("2", "3", "pool")
    train_backbone: bool = False
    # per-FPN-level anchor sizes from the rcnn YAML; None -> torchvision defaults
    anchor_sizes: Optional[Tuple[Tuple[int, ...], ...]] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, pad_mask: jnp.ndarray):
        from poet_tpu.models.maskrcnn import MaskRCNNDetector

        feats = ResNetFPN(dtype=self.dtype, name="fpn_body")(images)
        if not self.train_backbone:
            feats = {k: jax.lax.stop_gradient(v) for k, v in feats.items()}
        det_kwargs = {}
        if self.anchor_sizes is not None:
            det_kwargs["anchor_sizes"] = self.anchor_sizes
        # box decode / score / NMS arithmetic stays f32 for ranking stability
        # in every setting. At bf16 compute (production) the detector HEADS
        # (RPN convs, fc6/fc7, predictor) also run bf16 on the native maps —
        # r5: they were silently promoting to f32 MXU rates; the reference's
        # deployed figure is TensorRT fp16 (README.md:35). At f32 the path
        # is bit-identical to the torch oracle.
        bf16 = jnp.dtype(self.dtype) == jnp.bfloat16
        dets = MaskRCNNDetector(
            num_classes=self.num_classes,
            max_detections=self.max_detections,
            post_nms_top_n=self.post_nms_top_n,
            name="detector",
            dtype=jnp.bfloat16 if bf16 else None,
            **det_kwargs,
        )(feats if bf16
          else {k: v.astype(jnp.float32) for k, v in feats.items()},
          images.shape[1:3], pool_feats=feats)

        if self.obj_id_map is not None:
            raw = dets["labels"]
            mapped = jnp.full_like(raw, -1)
            for src, dst in self.obj_id_map:
                mapped = jnp.where(raw == src, dst, mapped)
            dets["valid"] = dets["valid"] & (mapped > 0)
            dets["labels"] = mapped

        features, masks = [], []
        for name in sorted(self.return_layers):
            x = feats[name]
            features.append(x)
            masks.append(downsample_mask(pad_mask, x.shape[1:3]))
        return features, masks, dets


class MaskRCNNFeatureBackbone(nn.Module):
    """ResNet-50-FPN feature levels ['2', '3', 'pool'] (strides 16/32/64).

    Parity: MaskRCNNBackbone with return_interm_layers=True
    (backbone_maskrcnn.py:37-42,118-125). Detection heads (RPN + RoI) are a
    separate module (poet_tpu.models.maskrcnn) — in gt/jitter bbox modes the
    reference never consumes detections, only these feature maps.
    """

    return_layers: Tuple[str, ...] = ("2", "3", "pool")
    num_channels: Tuple[int, ...] = (256, 256, 256)
    train_backbone: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, pad_mask: jnp.ndarray):
        # only compute the consumed pyramid levels (the detector-less path
        # never touches strides 4/8 — see FPN.levels)
        feats = ResNetFPN(dtype=self.dtype, levels=tuple(self.return_layers),
                          name="fpn_body")(images)
        if not self.train_backbone:
            feats = {k: jax.lax.stop_gradient(v) for k, v in feats.items()}
        features, masks = [], []
        for name in sorted(self.return_layers):
            x = feats[name]
            features.append(x)
            masks.append(downsample_mask(pad_mask, x.shape[1:3]))
        return features, masks, None  # no detections


def add_position_embeddings(
    masks: List[jnp.ndarray], hidden_dim: int, dtype=jnp.float32,
    scale: float = 2 * _math.pi,
) -> List[jnp.ndarray]:
    """Sine embedding per level. Parity: Joiner pos loop (backbone.py:46-48).

    `scale` honors --position_embedding_scale. The reference accepts that flag
    (main.py:69) but never passes it into PositionEmbeddingSine
    (position_encoding.py:119 builds with the 2*pi default) — here it is
    actually plumbed; the reference default reproduces reference outputs.
    """
    return [
        position_embedding_sine(
            m, num_pos_feats=hidden_dim // 2, scale=scale, dtype=jnp.float32
        ).astype(dtype)
        for m in masks
    ]


class PositionEmbeddingLearned(nn.Module):
    """Learned 50x50 absolute embedding. Parity: models/position_encoding.py:87-112.

    Row/col embedding tables of `num_pos_feats` each; output channel order is
    x-features then y-features (position_encoding.py:108-111 — NOTE: the
    opposite of the sine embedding's y-then-x). One instance is shared across
    pyramid levels, like the reference's single module inside the Joiner
    (models/backbone.py:21-30). Levels larger than the 50x50 table fail at
    trace time, matching the reference's out-of-range nn.Embedding error.
    """

    num_pos_feats: int = 128

    @nn.compact
    def __call__(self, pad_mask: jnp.ndarray) -> jnp.ndarray:
        B, H, W = pad_mask.shape
        if H > 50 or W > 50:
            raise ValueError(
                f"PositionEmbeddingLearned: level {H}x{W} exceeds the 50x50 "
                "table (reference models/position_encoding.py:93-94)")
        row = self.param("row_embed", nn.initializers.uniform(1.0), (50, self.num_pos_feats))
        col = self.param("col_embed", nn.initializers.uniform(1.0), (50, self.num_pos_feats))
        x_emb = col[:W]                                   # (W, F)
        y_emb = row[:H]                                   # (H, F)
        pos = jnp.concatenate(
            [
                jnp.broadcast_to(x_emb[None, :, :], (H, W, self.num_pos_feats)),
                jnp.broadcast_to(y_emb[:, None, :], (H, W, self.num_pos_feats)),
            ],
            axis=-1,
        )
        return jnp.broadcast_to(pos[None], (B, H, W, 2 * self.num_pos_feats))
