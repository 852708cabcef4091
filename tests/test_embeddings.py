"""Positional-embedding parity tests against independent numpy references."""

import math

import numpy as np
import jax.numpy as jnp

from poet_tpu.ops.embeddings import bbox_embedding_sine, position_embedding_sine


def _np_position_embedding_sine(mask, num_pos_feats=128, temperature=10000.0, scale=2 * math.pi):
    """Independent numpy re-derivation of the DETR sine embedding (normalized)."""
    not_mask = ~mask
    y_embed = np.cumsum(not_mask, axis=1).astype(np.float32)
    x_embed = np.cumsum(not_mask, axis=2).astype(np.float32)
    eps = 1e-6
    y_embed = (y_embed - 0.5) / (y_embed[:, -1:, :] + eps) * scale
    x_embed = (x_embed - 0.5) / (x_embed[:, :, -1:] + eps) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = np.stack([np.sin(pos_x[..., 0::2]), np.cos(pos_x[..., 1::2])], axis=4).reshape(
        *pos_x.shape[:3], -1
    )
    pos_y = np.stack([np.sin(pos_y[..., 0::2]), np.cos(pos_y[..., 1::2])], axis=4).reshape(
        *pos_y.shape[:3], -1
    )
    return np.concatenate([pos_y, pos_x], axis=3)


def test_position_embedding_unpadded():
    mask = np.zeros((2, 8, 12), dtype=bool)
    out = np.asarray(position_embedding_sine(jnp.asarray(mask), num_pos_feats=64))
    expected = _np_position_embedding_sine(mask, num_pos_feats=64)
    assert out.shape == (2, 8, 12, 128)
    np.testing.assert_allclose(out, expected, atol=5e-5)


def test_position_embedding_padded():
    mask = np.zeros((1, 10, 10), dtype=bool)
    mask[:, 7:, :] = True  # bottom rows padded
    mask[:, :, 8:] = True  # right cols padded
    out = np.asarray(position_embedding_sine(jnp.asarray(mask), num_pos_feats=64))
    expected = _np_position_embedding_sine(mask, num_pos_feats=64)
    # Padded pixels divide a 0-cumsum by eps -> sin(1e7), where f32 and f64
    # trig legitimately diverge; those embeddings are masked downstream, so
    # compare valid pixels only.
    valid = ~mask[0]
    np.testing.assert_allclose(out[0][valid], expected[0][valid], atol=5e-5)


def test_bbox_embedding_structure(rng):
    boxes = rng.uniform(0, 1, size=(5, 4)).astype(np.float32)
    npf = 32
    out = np.asarray(bbox_embedding_sine(jnp.asarray(boxes), num_pos_feats=npf))
    assert out.shape == (5, 8 * npf)
    # coordinate c at frequency 2^k: sin block then cos block per coordinate
    dim_t = 2.0 ** np.arange(npf)
    for ci in range(4):
        enc = boxes[:, ci : ci + 1] * dim_t
        np.testing.assert_allclose(out[:, ci * 2 * npf : ci * 2 * npf + npf], np.sin(enc), atol=1e-5)
        np.testing.assert_allclose(
            out[:, ci * 2 * npf + npf : (ci + 1) * 2 * npf], np.cos(enc), atol=1e-5
        )


def test_bbox_embedding_batched(rng):
    boxes = rng.uniform(0, 1, size=(3, 7, 4)).astype(np.float32)
    out = np.asarray(bbox_embedding_sine(jnp.asarray(boxes), num_pos_feats=32))
    single = np.asarray(bbox_embedding_sine(jnp.asarray(boxes[1]), num_pos_feats=32))
    np.testing.assert_allclose(out[1], single, atol=1e-6)
