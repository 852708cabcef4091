"""Multi-scale deformable attention sampling core — pure-XLA implementation.

This is the TPU-native equivalent of the Deformable-DETR CUDA op
`MSDeformAttnFunction` that the reference imports (external dependency; used
at models/deformable_transformer.py:24,177,201,248) — the single hot kernel of
the whole model. Semantics match the CUDA/`grid_sample` reference:

  * sampling locations are normalized to [0, 1] per level,
  * bilinear interpolation with `align_corners=False` pixel mapping
    (pix = loc * size - 0.5) and ZERO padding outside the feature map,
  * output = sum over (levels, points) of attention_weight * sampled value.

Design: spatial shapes are STATIC (Python ints) so XLA sees fixed shapes and
can fuse the per-level gathers; the per-level corner gathers are expressed as
one `take_along_axis` of all (point, corner) indices at once, which lowers to
a single fused gather per level. Fully differentiable via autodiff — this is
both the correctness reference for the Pallas kernel and the fallback path.

A fused Pallas TPU kernel lives in `poet_tpu.ops.deform_attn_pallas`.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def ms_deform_attn_xla(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Multi-scale deformable attention (pure XLA).

    Args:
      value: (B, S, H, D) flattened multi-level features; S = sum(Hl * Wl).
        Padded positions must already be zeroed (the module masks them).
      spatial_shapes: static list of (Hl, Wl) per level, sum(Hl*Wl) == S.
      sampling_locations: (B, Q, H, L, P, 2) in [0, 1], (x, y) order.
      attention_weights: (B, Q, H, L, P), softmax-normalized over (L, P).

    Returns:
      (B, Q, H * D) attended features.
    """
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    assert len(spatial_shapes) == L
    assert sum(h * w for h, w in spatial_shapes) == S

    dtype = value.dtype
    out = jnp.zeros((B, Q, H, D), dtype=jnp.promote_types(dtype, jnp.float32))

    start = 0
    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        value_l = value[:, start : start + Hl * Wl]          # (B, Hl*Wl, H, D)
        start += Hl * Wl

        loc = sampling_locations[:, :, :, lvl]               # (B, Q, H, P, 2)
        w_attn = attention_weights[:, :, :, lvl]             # (B, Q, H, P)

        # grid_sample align_corners=False pixel mapping.
        x = loc[..., 0] * Wl - 0.5                           # (B, Q, H, P)
        y = loc[..., 1] * Hl - 0.5

        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = (x - x0).astype(dtype)
        ty = (y - y0).astype(dtype)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        # 4 corners: (y0,x0), (y0,x1), (y1,x0), (y1,x1)
        corner_dx = jnp.array([0, 1, 0, 1], dtype=jnp.int32)
        corner_dy = jnp.array([0, 0, 1, 1], dtype=jnp.int32)
        cx = x0i[..., None] + corner_dx                      # (B, Q, H, P, 4)
        cy = y0i[..., None] + corner_dy

        in_bounds = (cx >= 0) & (cx < Wl) & (cy >= 0) & (cy < Hl)
        cxc = jnp.clip(cx, 0, Wl - 1)
        cyc = jnp.clip(cy, 0, Hl - 1)
        flat_idx = cyc * Wl + cxc                            # (B, Q, H, P, 4)

        # Bilinear corner weights, zeroed outside the map (zero padding).
        wx = jnp.stack([1.0 - tx, tx, 1.0 - tx, tx], axis=-1)
        wy = jnp.stack([1.0 - ty, 1.0 - ty, ty, ty], axis=-1)
        w_corner = wx * wy * in_bounds.astype(dtype)         # (B, Q, H, P, 4)

        # One fused gather for all (point, corner) pairs of this level:
        # indices (B, Q*P*4, H, 1) against value_l (B, S_l, H, D).
        idx = jnp.transpose(flat_idx, (0, 1, 3, 4, 2))       # (B, Q, P, 4, H)
        idx = idx.reshape(B, Q * P * 4, H, 1)
        gathered = jnp.take_along_axis(value_l, idx, axis=1) # (B, Q*P*4, H, D)
        gathered = gathered.reshape(B, Q, P, 4, H, D)
        gathered = jnp.transpose(gathered, (0, 1, 4, 2, 3, 5))  # (B, Q, H, P, 4, D)

        # Combine bilinear corner weights with attention weights and reduce.
        w_total = w_corner * w_attn[..., None]               # (B, Q, H, P, 4)
        out = out + jnp.einsum(
            "bqhpc,bqhpcd->bqhd", w_total.astype(jnp.float32), gathered.astype(jnp.float32)
        )

    return out.reshape(B, Q, H * D).astype(dtype)
