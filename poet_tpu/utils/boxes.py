"""Bounding-box math (pure jnp, fully vmappable / jittable).

Functional parity with the reference `util/box_ops.py:21-132`, generalised to
arbitrary leading batch dimensions and with masking-friendly semantics (no
degenerate-box asserts inside jit; GIoU handles empty boxes by clamping).
"""

from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) cxcywh -> xyxy. Parity: util/box_ops.py:21-25."""
    xc, yc, w, h = jnp.moveaxis(x, -1, 0)
    return jnp.stack([xc - 0.5 * w, yc - 0.5 * h, xc + 0.5 * w, yc + 0.5 * h], axis=-1)


def box_xyxy_to_cxcywh(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) xyxy -> cxcywh. Parity: util/box_ops.py:28-32."""
    x0, y0, x1, y1 = jnp.moveaxis(x, -1, 0)
    return jnp.stack([(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1)


def box_normalize_cxcywh(x: jnp.ndarray, image_size) -> jnp.ndarray:
    """Normalize cxcywh by (H, W). Parity: util/box_ops.py:35-40."""
    ih, iw = image_size[0], image_size[1]
    scale = jnp.stack([jnp.asarray(iw, x.dtype), jnp.asarray(ih, x.dtype)] * 2)
    return x / scale


def box_rescale_cxcywh(x: jnp.ndarray, image_size) -> jnp.ndarray:
    """Parity: util/box_ops.py:43-48."""
    ih, iw = image_size[0], image_size[1]
    scale = jnp.stack([jnp.asarray(iw, x.dtype), jnp.asarray(ih, x.dtype)] * 2)
    return x * scale


def box_normalize_xyxy(x: jnp.ndarray, image_size) -> jnp.ndarray:
    """Parity: util/box_ops.py:51-56."""
    ih, iw = image_size[0], image_size[1]
    scale = jnp.stack([jnp.asarray(iw, x.dtype), jnp.asarray(ih, x.dtype)] * 2)
    return x / scale


def box_rescale_xyxy(x: jnp.ndarray, image_size) -> jnp.ndarray:
    """Parity: util/box_ops.py:59-64."""
    ih, iw = image_size[0], image_size[1]
    scale = jnp.stack([jnp.asarray(iw, x.dtype), jnp.asarray(ih, x.dtype)] * 2)
    return x * scale


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    """Area of (..., 4) xyxy boxes."""
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise IoU of (N, 4) x (M, 4) xyxy boxes -> ((N, M) iou, (N, M) union).

    Parity: util/box_ops.py:68-81.
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / union, union


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU of (N, 4) x (M, 4) xyxy boxes -> (N, M).

    Parity: util/box_ops.py:84-105 (without the host-side degeneracy asserts,
    which cannot live inside jit; padded/dummy boxes are expected to be masked
    out by the caller).
    """
    iou, union = box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.maximum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / area


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W) binary masks -> (N, 4) xyxy boxes. Parity: util/box_ops.py:108-132."""
    if masks.size == 0:
        return jnp.zeros((0, 4), dtype=jnp.float32)
    h, w = masks.shape[-2:]
    y = jnp.arange(h, dtype=jnp.float32)
    x = jnp.arange(w, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(y, x, indexing="ij")
    m = masks.astype(jnp.float32)
    x_mask = m * xx[None]
    x_max = x_mask.reshape(m.shape[0], -1).max(-1)
    x_min = jnp.where(masks.astype(bool), xx[None], 1e8).reshape(m.shape[0], -1).min(-1)
    y_mask = m * yy[None]
    y_max = y_mask.reshape(m.shape[0], -1).max(-1)
    y_min = jnp.where(masks.astype(bool), yy[None], 1e8).reshape(m.shape[0], -1).min(-1)
    return jnp.stack([x_min, y_min, x_max, y_max], axis=1)
