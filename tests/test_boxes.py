"""Box-op tests against torchvision-independent numpy references."""

import numpy as np
import jax.numpy as jnp

from poet_tpu.utils import boxes as B


def _rand_xyxy(rng, n):
    xy = rng.uniform(0, 100, size=(n, 2))
    wh = rng.uniform(1, 50, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_cxcywh_roundtrip(rng):
    b = _rand_xyxy(rng, 20)
    out = np.asarray(B.box_cxcywh_to_xyxy(B.box_xyxy_to_cxcywh(jnp.asarray(b))))
    np.testing.assert_allclose(out, b, atol=1e-4)


def test_normalize_rescale(rng):
    b = _rand_xyxy(rng, 10)
    size = (480, 640)
    n = B.box_normalize_xyxy(jnp.asarray(b), size)
    r = np.asarray(B.box_rescale_xyxy(n, size))
    np.testing.assert_allclose(r, b, atol=1e-4)
    nc = np.asarray(B.box_normalize_cxcywh(jnp.asarray(b), size))
    np.testing.assert_allclose(nc, b / np.array([640, 480, 640, 480]), atol=1e-6)


def test_iou_simple():
    b1 = jnp.asarray([[0.0, 0, 10, 10]])
    b2 = jnp.asarray([[5.0, 5, 15, 15], [20.0, 20, 30, 30], [0.0, 0, 10, 10]])
    iou, union = B.box_iou(b1, b2)
    np.testing.assert_allclose(np.asarray(iou[0]), [25 / 175, 0.0, 1.0], atol=1e-6)


def test_giou_known_values():
    b1 = jnp.asarray([[0.0, 0, 10, 10]])
    b2 = jnp.asarray([[10.0, 0, 20, 10]])  # adjacent: iou 0, enclosing = union
    g = np.asarray(B.generalized_box_iou(b1, b2))
    np.testing.assert_allclose(g, [[0.0]], atol=1e-6)
    b3 = jnp.asarray([[20.0, 0, 30, 10]])  # separated: giou < 0
    g = np.asarray(B.generalized_box_iou(b1, b3))
    assert g[0, 0] < 0


def test_giou_matches_pairwise_definition(rng):
    b1 = _rand_xyxy(rng, 7)
    b2 = _rand_xyxy(rng, 5)
    g = np.asarray(B.generalized_box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    for i in range(7):
        for j in range(5):
            a1 = (b1[i, 2] - b1[i, 0]) * (b1[i, 3] - b1[i, 1])
            a2 = (b2[j, 2] - b2[j, 0]) * (b2[j, 3] - b2[j, 1])
            iw = max(0, min(b1[i, 2], b2[j, 2]) - max(b1[i, 0], b2[j, 0]))
            ih = max(0, min(b1[i, 3], b2[j, 3]) - max(b1[i, 1], b2[j, 1]))
            inter = iw * ih
            union = a1 + a2 - inter
            ew = max(b1[i, 2], b2[j, 2]) - min(b1[i, 0], b2[j, 0])
            eh = max(b1[i, 3], b2[j, 3]) - min(b1[i, 1], b2[j, 1])
            enc = ew * eh
            expected = inter / union - (enc - union) / enc
            np.testing.assert_allclose(g[i, j], expected, rtol=1e-5)


def test_masks_to_boxes():
    masks = np.zeros((2, 20, 30), dtype=np.float32)
    masks[0, 5:10, 3:8] = 1
    masks[1, 0:4, 10:25] = 1
    out = np.asarray(B.masks_to_boxes(jnp.asarray(masks)))
    np.testing.assert_allclose(out[0], [3, 5, 7, 9])
    np.testing.assert_allclose(out[1], [10, 0, 24, 3])
