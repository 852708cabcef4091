"""PoET — multi-object 6D pose estimation transformer (flax.linen).

Parity target: `PoET` in models/pose_estimation_transformer.py:32-451,
re-designed static-shape:
  * targets arrive pre-padded to num_queries (poet_tpu.data.structures), so
    the reference's per-image dummy-padding loop (:203-307) becomes pure
    array math — dummy slots keep the exact reference conventions
    (boxes = -1, query embedding fill = -10, class = -1),
  * per-decoder-layer heads produce STACKED outputs (n_layers, B, Q, ...),
  * class-specific head slicing (:365-384) is a vectorized take_along_axis
    instead of a Python loop over queries,
  * in backbone bbox-mode, detections enter as fixed-size (B, K) arrays with
    a validity mask and are reduced to the top-num_queries by score via
    lax.top_k (:287-301); order within a batch element is score-descending
    (the reference keeps raw detector order when fewer than num_queries —
    an order difference only, invisible to matcher and losses).
"""

from __future__ import annotations

import math as _math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from poet_tpu.config import ModelConfig
from poet_tpu.models.backbone import PositionEmbeddingLearned, add_position_embeddings
from poet_tpu.models.transformer import DeformableTransformer
from poet_tpu.ops.embeddings import bbox_embedding_sine, position_embedding_sine
from poet_tpu.utils import boxes as box_ops
from poet_tpu.utils.rotations import rotation_6d_to_matrix

DUMMY_EMBED_FILL = -10.0   # pose_estimation_transformer.py:229
DUMMY_BOX_FILL = -1.0      # pose_estimation_transformer.py:226


class MLP(nn.Module):
    """3-layer ReLU MLP head. Parity: pose_estimation_transformer.py:677-689."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 3

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, name=f"layer_{i}")(x))
        return nn.Dense(self.output_dim, name=f"layer_{self.num_layers - 1}")(x)


class PoET(nn.Module):
    """The pose-estimation transformer.

    Attributes follow ModelConfig; the backbone is injected as a submodule so
    detector families (ResNet-FPN / Mask R-CNN / YOLOv4) are pluggable.
    """

    backbone: nn.Module
    cfg: ModelConfig
    # --position_embedding {sine, learned} / --position_embedding_scale
    # (reference main.py:67-69; module selection position_encoding.py:115-125).
    # These mirror BackboneConfig — build_model plumbs them here because the
    # embedding is applied to the feature maps INSIDE the model (the
    # reference's Joiner owns it; here the extra pyramid levels at :134 need
    # it too, pose_estimation_transformer.py:326-335).
    position_embedding: str = "sine"
    position_embedding_scale: float = 2 * _math.pi

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,                   # (B, H, W, 3) in [0, 1]
        pad_mask: jnp.ndarray,                 # (B, H, W) bool, True = padded
        targets: Optional[Dict[str, jnp.ndarray]] = None,
        detections: Optional[Dict[str, jnp.ndarray]] = None,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        C = cfg.hidden_dim
        Q = cfg.num_queries
        B = images.shape[0]
        n_classes = cfg.n_classes + 1      # +1 dummy/background (:64)
        image_size = images.shape[1:3]     # (H, W)

        compute_dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        features, masks, backbone_dets = self.backbone(images, pad_mask)
        if detections is None:
            detections = backbone_dets
        if self.position_embedding == "learned":
            # one module shared across levels, like the reference's single
            # PositionEmbeddingLearned inside the Joiner (backbone.py:21-30)
            pos_module = PositionEmbeddingLearned(
                num_pos_feats=C // 2, name="position_embedding")
            embed_level = lambda m: pos_module(m).astype(compute_dtype)
            pos = [embed_level(m) for m in masks]
        else:
            embed_level = lambda m: position_embedding_sine(
                m, num_pos_feats=C // 2, scale=self.position_embedding_scale
            ).astype(compute_dtype)
            pos = add_position_embeddings(
                masks, C, compute_dtype, scale=self.position_embedding_scale)

        # ---- query construction ------------------------------------------
        if cfg.bbox_mode in ("gt", "jitter"):
            assert targets is not None
            t_boxes = targets["boxes"] if cfg.bbox_mode == "gt" else targets["jitter_boxes"]
            t_classes = targets["labels"]
            n_boxes = targets["n_boxes"]
            valid_q = jnp.arange(Q)[None, :] < n_boxes[:, None]     # (B, Q)
            t_scores = valid_q.astype(jnp.float32)
        elif cfg.bbox_mode == "backbone":
            assert detections is not None, "backbone bbox_mode needs detections"
            t_boxes, t_classes, t_scores, n_boxes, valid_q = self._select_detections(
                detections, Q, image_size
            )
        else:
            raise NotImplementedError(cfg.bbox_mode)

        # dummy conventions (:225-236): boxes -1, classes -1
        t_boxes = jnp.where(valid_q[..., None], t_boxes, DUMMY_BOX_FILL)
        t_classes = jnp.where(valid_q, t_classes, -1)

        embed = bbox_embedding_sine(t_boxes, num_pos_feats=C // 8)   # (B, Q, C)
        embed = jnp.concatenate([embed, embed], axis=-1)             # repeat(1, 2) (:219)
        query_embeds = jnp.where(valid_q[..., None], embed, DUMMY_EMBED_FILL)

        if cfg.query_embedding == "learned":                         # (:342-343)
            query_embeds = self.param(
                "query_embed", nn.initializers.normal(1.0), (Q, 2 * C)
            )

        # ---- input projections + extra pyramid levels (:313-335) ---------
        srcs = []
        num_backbone_levels = len(features)
        num_extra = max(0, cfg.num_feature_levels - num_backbone_levels)
        for lvl, feat in enumerate(features):
            x = nn.Conv(C, (1, 1), dtype=compute_dtype, name=f"input_proj_{lvl}_conv")(feat)
            x = nn.GroupNorm(num_groups=32, dtype=compute_dtype,
                             name=f"input_proj_{lvl}_gn")(x)
            srcs.append(x)
        for e in range(num_extra):
            lvl = num_backbone_levels + e
            src_in = features[-1] if e == 0 else srcs[-1]            # (:326-329)
            x = nn.Conv(C, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        dtype=compute_dtype, name=f"input_proj_{lvl}_conv")(src_in)
            x = nn.GroupNorm(num_groups=32, dtype=compute_dtype,
                             name=f"input_proj_{lvl}_gn")(x)
            srcs.append(x)
            m = jax.image.resize(
                pad_mask.astype(jnp.float32), (B,) + x.shape[1:3], "nearest"
            ).astype(bool)
            masks.append(m)
            # extra levels use the same embedding module/scale as the backbone
            # levels (pose_estimation_transformer.py:326-335 calls the Joiner's
            # position-embedding module on the new mask)
            pos.append(embed_level(m))

        # ---- reference points (:337-340) ----------------------------------
        reference_points = t_boxes[:, :, :2] if cfg.reference_points == "bbox" else None

        hs, init_reference, _ = DeformableTransformer(
            d_model=C,
            nhead=cfg.nheads,
            num_encoder_layers=cfg.enc_layers,
            num_decoder_layers=cfg.dec_layers,
            dim_feedforward=cfg.dim_feedforward,
            dropout=cfg.dropout,
            num_feature_levels=cfg.num_feature_levels,
            dec_n_points=cfg.dec_n_points,
            enc_n_points=cfg.enc_n_points,
            dtype=compute_dtype,
            enc_impl=cfg.resolved_enc_deform_impl(),
            dec_impl=cfg.resolved_dec_deform_impl(),
            remat=cfg.enc_remat_enabled(),
            name="transformer",
        )(srcs, masks, pos, query_embeds, reference_points, deterministic)
        # hs: (n_dec_layers, B, Q, C)

        # ---- per-layer heads (:356-396) -----------------------------------
        rot_dim = cfg.rot_dim
        class_mult = n_classes if cfg.class_mode == "specific" else 1
        output_idx = jnp.where(t_classes > 0, t_classes, 0)          # (:354)

        translations, rotations = [], []
        translations_al, rotations_al = [], []
        for lvl in range(cfg.dec_layers):
            h = hs[lvl]
            out_t = MLP(C, 3 * class_mult, name=f"translation_head_{lvl}")(h)
            out_r = MLP(C, rot_dim * class_mult, name=f"rotation_head_{lvl}")(h)
            if cfg.class_mode == "specific":
                out_t = self._select_class(out_t, output_idx, n_classes)
                out_r = self._select_class(out_r, output_idx, n_classes)
            out_r = self._process_rotation(out_r)
            translations.append(out_t)
            rotations.append(out_r)
            if cfg.aleatoric:
                al_t = MLP(C, 3 * class_mult, name=f"translation_head_aleatoric_{lvl}")(h)
                al_r = MLP(C, 3 * class_mult, name=f"rotation_head_aleatoric_{lvl}")(h)
                if cfg.class_mode == "specific":
                    al_t = self._select_class(al_t, output_idx, n_classes)
                    al_r = self._select_class(al_r, output_idx, n_classes)
                translations_al.append(al_t)
                rotations_al.append(al_r)

        out: Dict[str, Any] = {
            "translations": jnp.stack(translations),     # (n_layers, B, Q, 3)
            "rotations": jnp.stack(rotations),           # (n_layers, B, Q, 3, 3|4)
            "pred_boxes": t_boxes,                       # (B, Q, 4)
            "pred_classes": t_classes,                   # (B, Q)
            "pred_scores": t_scores,                     # (B, Q): detector
            # confidence in backbone mode, 1.0 for valid gt/jitter queries
            # (consumed by the BOP CSV exporter; the reference always writes
            # score=1.0, engine.py:232)
            "n_boxes": n_boxes,                          # (B,)
            "query_valid": valid_q,                      # (B, Q)
        }
        if cfg.aleatoric:
            out["translations_aleatoric"] = jnp.stack(translations_al)
            out["rotations_aleatoric"] = jnp.stack(rotations_al)
        return out

    # ------------------------------------------------------------------
    def _select_detections(self, detections, Q, image_size):
        """Reduce detector output to the top-Q by score (:240-305).

        detections: dict with
          boxes (B, K, 4) xyxy in absolute pixels,
          scores (B, K), labels (B, K) int, valid (B, K) bool.
        """
        boxes = detections["boxes"]
        scores = jnp.where(detections["valid"], detections["scores"], -jnp.inf)
        labels = detections["labels"]
        B, K = scores.shape
        k = min(Q, K)
        top_scores, top_idx = jax.lax.top_k(scores, k)               # (B, k)
        sel_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
        sel_labels = jnp.take_along_axis(labels, top_idx, axis=1)
        valid = jnp.isfinite(top_scores)
        if k < Q:  # pad out to Q slots
            pad = Q - k
            sel_boxes = jnp.pad(sel_boxes, ((0, 0), (0, pad), (0, 0)))
            sel_labels = jnp.pad(sel_labels, ((0, 0), (0, pad)), constant_values=-1)
            valid = jnp.pad(valid, ((0, 0), (0, pad)))
            top_scores = jnp.pad(top_scores, ((0, 0), (0, pad)))
        sel_scores = jnp.where(valid, top_scores, 0.0)
        n_boxes = jnp.sum(valid, axis=1).astype(jnp.int32)
        # xyxy absolute -> cxcywh normalized (:258-261)
        cxcywh = box_ops.box_xyxy_to_cxcywh(sel_boxes)
        cxcywh = box_ops.box_normalize_cxcywh(cxcywh, image_size)
        return cxcywh, sel_labels, sel_scores, n_boxes, valid

    def _select_class(self, out, output_idx, n_classes):
        """(B, Q, n_classes * d) -> (B, Q, d) picking the predicted class row.

        Vectorized form of the Python slice loop at :365-384.
        """
        B, Q, _ = out.shape
        out = out.reshape(B, Q, n_classes, -1)
        idx = output_idx[..., None, None]
        return jnp.take_along_axis(out, idx, axis=2)[:, :, 0, :]

    def _process_rotation(self, pred):
        """6d -> SO(3) via Gram–Schmidt; quaternions -> L2 normalize (:420-432)."""
        if self.cfg.rotation_representation == "6d":
            return rotation_6d_to_matrix(pred)
        norm = jnp.linalg.norm(pred, axis=-1, keepdims=True)
        return pred / jnp.maximum(norm, 1e-12)
