"""Analytic detector-op goldens (VERDICT r3 next #8).

torchvision cannot be installed in this image and there is no egress to
record real fixtures, so the detector parity suite compares the JAX ops
against an in-repo pure-torch re-implementation — a SHARED misreading of
torchvision semantics would pass both sides. These tests close that hole
with ground truth that depends on neither implementation: values derived
in closed form from the PUBLISHED op definitions
(torchvision.ops.roi_align / nms docs; torchvision BoxCoder / FPN
LevelMapper equations — the behavior the reference drives at
models/backbone_maskrcnn.py:59-116).

  * RoIAlign on an affine feature map f(y,x) = a + b*x + c*y: bilinear
    interpolation reproduces affine functions exactly and the s^2-sample
    bin average of an affine function equals its value at the bin center,
    so every output bin is a + b*x_center + c*y_center in closed form
    (legacy aligned=False: x0 = x1*scale, bin centers at x0+(j+0.5)*bin_w).
  * Greedy NMS on a hand-built configuration whose keep set is enumerated
    by hand, including a score tie (lower index wins) and a CHAIN case: a
    box overlapping only an already-suppressed box must survive (the
    property a naive "suppressed by any higher-scored overlap" gets wrong).
  * BoxCoder.decode and the FPN level mapper at hand-computed points.

Both the production JAX ops AND the test-suite torch oracle
(tests/test_detector_numeric_parity.py) are pinned to these values.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from poet_tpu.models.maskrcnn import decode_boxes
from poet_tpu.ops.detection import (
    multiscale_roi_align_batched,
    nms_padded,
    roi_align,
)


def _affine_feats(H, W, C, coefs):
    """f[y, x, c] = a_c + b_c * x + c_c * y."""
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    out = np.zeros((H, W, C), np.float32)
    for ch, (a, b, c) in enumerate(coefs):
        out[:, :, ch] = a + b * x + c * y
    return out


def _expected_roi_affine(boxes, scale, coefs, out=7):
    """Closed-form RoIAlign output for affine features (aligned=False)."""
    R = boxes.shape[0]
    exp = np.zeros((R, out, out, len(coefs)), np.float32)
    for r, (x1, y1, x2, y2) in enumerate(boxes):
        x0, y0 = x1 * scale, y1 * scale
        bw = max((x2 - x1) * scale, 1.0) / out
        bh = max((y2 - y1) * scale, 1.0) / out
        for i in range(out):
            for j in range(out):
                xc = x0 + (j + 0.5) * bw
                yc = y0 + (i + 0.5) * bh
                for ch, (a, b, c) in enumerate(coefs):
                    exp[r, i, j, ch] = a + b * xc + c * yc
    return exp


COEFS = [(0.5, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0), (1.0, 0.25, -0.5)]


def test_roi_align_affine_golden():
    """JAX roi_align == closed form on affine features (interior boxes)."""
    H, W = 40, 56
    feats = _affine_feats(H, W, len(COEFS), COEFS)
    # image-coordinate boxes, interior at scale 0.25 (samples stay >= 1 px
    # from borders: no clamping, no outside-mask effects)
    boxes = np.array([
        [8.0, 8.0, 120.0, 96.0],
        [30.0, 20.0, 90.0, 140.0],
        [12.5, 17.0, 200.1, 150.7],
    ], np.float32)
    scale = 0.25
    out = roi_align(jnp.asarray(feats), jnp.asarray(boxes), 7, scale, 2)
    exp = _expected_roi_affine(boxes, scale, COEFS)
    np.testing.assert_allclose(np.asarray(out), exp, rtol=0, atol=1e-4)


def test_roi_align_affine_golden_slab_and_pallas():
    """The production multiscale paths (slab + Pallas-interpret) reproduce
    the same closed form: single box scales pin the level mapper to a known
    level, whose affine map yields the expected bins."""
    from poet_tpu.ops.roi_align_pallas import multiscale_roi_align_pallas

    shapes = [(60, 80), (30, 40), (15, 20), (8, 10)]
    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(_affine_feats(h, w, len(COEFS), COEFS))[None]
             for h, w in shapes]
    # sqrt(area) = 112 -> lvl = floor(4 + log2(112/224 + eps)) = 3 ->
    # feature index 1 (k_min = 2); sqrt(area) = 56 -> index 0
    boxes = np.array([[
        [40.0, 30.0, 152.0, 142.0],     # 112x112 -> level index 1 (stride 8)
        [60.0, 50.0, 116.0, 106.0],     # 56x56   -> level index 0 (stride 4)
    ]], np.float32)
    exp = np.stack([
        _expected_roi_affine(boxes[0, :1], 1.0 / 8, COEFS)[0],
        _expected_roi_affine(boxes[0, 1:], 1.0 / 4, COEFS)[0],
    ])[None]
    out_slab = multiscale_roi_align_batched(
        feats, strides, jnp.asarray(boxes), impl="slab")
    np.testing.assert_allclose(np.asarray(out_slab), exp, atol=1e-4)
    out_pal = multiscale_roi_align_pallas(
        feats, strides, jnp.asarray(boxes), interpret=True)
    np.testing.assert_allclose(np.asarray(out_pal), exp, atol=1e-4)


def test_roi_align_affine_golden_torch_oracle():
    """The in-repo torch oracle is pinned to the SAME closed form — if it
    misread torchvision's sampling geometry, this fails independently of
    the JAX implementation."""
    torch = pytest.importorskip("torch")
    from tests.test_detector_numeric_parity import t_roi_align_level

    H, W = 40, 56
    feats = _affine_feats(H, W, len(COEFS), COEFS)
    boxes = np.array([
        [8.0, 8.0, 120.0, 96.0],
        [30.0, 20.0, 90.0, 140.0],
    ], np.float32)
    scale = 0.25
    # oracle is NCHW
    out = t_roi_align_level(
        torch.from_numpy(feats).permute(2, 0, 1),
        torch.from_numpy(boxes), scale)                    # (R, C, out, out)
    out = out.permute(0, 2, 3, 1).numpy()
    exp = _expected_roi_affine(boxes, scale, COEFS)
    np.testing.assert_allclose(out, exp, rtol=0, atol=1e-4)


# hand-built NMS configuration (iou_threshold = 0.5). All boxes 10x10
# (area 100) so IoU = inter / (200 - inter): suppression needs inter > 66.67.
#   idx score box                 fate (greedy, by hand)
#   0   0.90  [0,  0, 10, 10]     kept (highest score)
#   1   0.80  [0,  0.5, 10, 10.5] inter(b0) = 10*9.5 = 95   -> suppressed by 0
#   2   0.70  [6,  0, 16, 10]     inter(b0) = 4*10  = 40    -> kept
#   3   0.65  [3,  0, 13, 10]     inter(b0) = 7*10 = 70 > 66.7 -> suppressed
#   4   0.60  [12, 0, 22, 10]     inter(b2) = 4*10, inter(b0) = 0 -> kept
#   5   0.55  [3,  2, 13, 12]     inter(b0) = 7*8 = 56, inter(b2) = 7*8 = 56,
#                                 inter(b4) = 1*8 = 8; only the DEAD b3
#                                 overlaps > threshold (10*8 = 80) -> KEPT
#                                 (chain resurrection: naive any-overlap kills it)
#   6   0.55  [40, 40, 50, 50]    isolated, TIES with 5: index 5 ranks first,
#                                 both kept
#   7   0.30  [40, 40, 50, 50]    identical to 6 -> suppressed by 6
NMS_BOXES = np.array([
    [0, 0, 10, 10], [0, 0.5, 10, 10.5], [6, 0, 16, 10], [3, 0, 13, 10],
    [12, 0, 22, 10], [3, 2, 13, 12], [40, 40, 50, 50], [40, 40, 50, 50],
], np.float32)
NMS_SCORES = np.array([0.9, 0.8, 0.7, 0.65, 0.6, 0.55, 0.55, 0.3], np.float32)
NMS_KEEP = [0, 2, 4, 5, 6]          # in descending-score, index-asc order


def test_nms_hand_golden():
    keep_idx, keep_valid = nms_padded(
        jnp.asarray(NMS_BOXES), jnp.asarray(NMS_SCORES), 0.5, 8)
    got = np.asarray(keep_idx)[np.asarray(keep_valid)].tolist()
    assert got == NMS_KEEP, got


def test_nms_hand_golden_torch_oracle():
    torch = pytest.importorskip("torch")
    from tests.test_detector_numeric_parity import t_nms

    got = t_nms(torch.from_numpy(NMS_BOXES), torch.from_numpy(NMS_SCORES),
                0.5).tolist()
    assert got == NMS_KEEP, got


def test_box_decode_hand_golden():
    """BoxCoder.decode at hand-computed points: anchor (10,20)->(30,60)
    (w=20, h=40, cx=20, cy=40); deltas (0.1, -0.2, ln2, ln0.5) ->
    cx=22, cy=32, w=40, h=20 -> box (2, 22, 42, 42)."""
    anchors = np.array([[10.0, 20.0, 30.0, 60.0]], np.float32)
    deltas = np.array([[0.1, -0.2, np.log(2.0), np.log(0.5)]], np.float32)
    out = decode_boxes(jnp.asarray(deltas), jnp.asarray(anchors))
    np.testing.assert_allclose(np.asarray(out), [[2.0, 22.0, 42.0, 42.0]],
                               atol=1e-4)

    torch = pytest.importorskip("torch")
    from tests.test_detector_numeric_parity import t_decode

    got = t_decode(torch.from_numpy(deltas), torch.from_numpy(anchors))
    np.testing.assert_allclose(got.numpy().reshape(1, 4),
                               [[2.0, 22.0, 42.0, 42.0]], atol=1e-4)


def test_level_mapper_hand_golden():
    """FPN Eq.(1): lvl = floor(4 + log2(sqrt(wh)/224)), clipped to [2, 5],
    minus k_min=2. Hand points: 224->4->idx 2; 112->3->idx 1; 56->2->idx 0;
    448->5->idx 3; 20->clip->idx 0; 2000->clip->idx 3."""
    from poet_tpu.ops.detection import _roi_level_geometry

    shapes = [(60, 80), (30, 40), (15, 20), (8, 10)]
    strides = [4, 8, 16, 32]
    sizes = [224.0, 112.0, 56.0, 448.0, 20.0, 2000.0]
    boxes = jnp.asarray(
        np.array([[0, 0, s, s] for s in sizes], np.float32))
    lvl, *_ = _roi_level_geometry(shapes, strides, boxes, 224, 4)
    assert np.asarray(lvl).tolist() == [2, 1, 0, 3, 0, 3]
