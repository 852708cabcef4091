"""Positional embeddings (pure functions; modules live in poet_tpu.models).

Parity targets:
  * `position_embedding_sine`  — models/position_encoding.py:24-60 (DETR 2D
    sine over the unpadded-pixel cumsum, normalize=True).
  * `bbox_embedding_sine`      — models/position_encoding.py:63-84 (PoET's
    dyadic-frequency box embedding used to build query embeddings).

Layout note: images/features are channels-LAST here (B, H, W, C) — the native
TPU layout — where the torch reference is channels-first.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def position_embedding_sine(
    pad_mask: jnp.ndarray,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2 * math.pi,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """2D sine embedding from a padding mask.

    Args:
      pad_mask: (B, H, W) bool, True on PADDED pixels (reference convention).
    Returns:
      (B, H, W, 2 * num_pos_feats) embedding, y-features first then x-features
      (matches the reference's channel order after the channels-first permute).
    """
    not_mask = jnp.logical_not(pad_mask)
    y_embed = jnp.cumsum(not_mask.astype(dtype), axis=1)
    x_embed = jnp.cumsum(not_mask.astype(dtype), axis=2)
    if normalize:
        eps = 1e-6
        y_embed = (y_embed - 0.5) / (y_embed[:, -1:, :] + eps) * scale
        x_embed = (x_embed - 0.5) / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=dtype)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    # Interleave sin/cos exactly like the reference's stack(...).flatten(3)
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=4).reshape(
        *pos_x.shape[:3], -1
    )
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=4).reshape(
        *pos_y.shape[:3], -1
    )
    return jnp.concatenate([pos_y, pos_x], axis=3)


def bbox_embedding_sine(bboxes: jnp.ndarray, num_pos_feats: int = 32, dtype=None) -> jnp.ndarray:
    """Dyadic sine/cosine embedding of (..., 4) cxcywh boxes.

    Returns (..., 8 * num_pos_feats); with num_pos_feats = hidden_dim // 8 the
    output is exactly hidden_dim wide. Parity: models/position_encoding.py:63-84
    — per coordinate: concat(sin(c * 2^k), cos(c * 2^k)) for k in [0, npf),
    coordinates ordered (x, y, w, h).
    """
    dtype = dtype or bboxes.dtype
    dim_t = 2.0 ** jnp.arange(num_pos_feats, dtype=dtype)
    enc = bboxes[..., :, None] * dim_t          # (..., 4, npf)
    enc = jnp.concatenate([jnp.sin(enc), jnp.cos(enc)], axis=-1)  # (..., 4, 2*npf)
    return enc.reshape(*bboxes.shape[:-1], 8 * num_pos_feats)
