"""Static-shape NMS / RoIAlign tests.

torchvision is not available in this image, so oracles are independent
numpy implementations written from the published op definitions, plus
analytic spot checks.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from poet_tpu.ops.detection import (
    batched_class_nms,
    multiscale_roi_align,
    nms_padded,
    pairwise_iou_xyxy,
    roi_align,
)


def _rand_boxes(rng, n, size=100.0):
    xy = rng.uniform(0, size * 0.8, size=(n, 2))
    wh = rng.uniform(2, size * 0.3, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def _np_iou(b1, b2):
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    iw = np.maximum(
        0, np.minimum(b1[:, None, 2], b2[None, :, 2]) - np.maximum(b1[:, None, 0], b2[None, :, 0])
    )
    ih = np.maximum(
        0, np.minimum(b1[:, None, 3], b2[None, :, 3]) - np.maximum(b1[:, None, 1], b2[None, :, 1])
    )
    inter = iw * ih
    return inter / (a1[:, None] + a2[None, :] - inter)


def _np_nms(boxes, scores, iou_t):
    """Greedy NMS oracle (torchvision semantics: desc score, IoU > t suppress)."""
    order = np.argsort(-scores, kind="stable")
    keep, suppressed = [], np.zeros(len(boxes), bool)
    iou = _np_iou(boxes, boxes)
    for i in order:
        if suppressed[i] or not np.isfinite(scores[i]):
            continue
        keep.append(i)
        suppressed |= iou[i] > iou_t
    return np.asarray(keep, dtype=np.int64)


def _np_roi_align(feats, boxes, out_size, scale, ratio):
    """RoIAlign oracle from the Mask R-CNN paper definition (aligned=False)."""
    H, W, C = feats.shape

    def bilinear(y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C)
        y = min(max(y, 0.0), H - 1.0)
        x = min(max(x, 0.0), W - 1.0)
        y0 = min(int(np.floor(y)), H - 2)
        x0 = min(int(np.floor(x)), W - 2)
        fy, fx = y - y0, x - x0
        return (
            feats[y0, x0] * (1 - fy) * (1 - fx)
            + feats[y0, x0 + 1] * (1 - fy) * fx
            + feats[y0 + 1, x0] * fy * (1 - fx)
            + feats[y0 + 1, x0 + 1] * fy * fx
        )

    R = len(boxes)
    out = np.zeros((R, out_size, out_size, C))
    for r, b in enumerate(boxes):
        x0, y0, x1, y1 = b * scale
        rw = max(x1 - x0, 1.0)
        rh = max(y1 - y0, 1.0)
        bw, bh = rw / out_size, rh / out_size
        for i in range(out_size):
            for j in range(out_size):
                acc = np.zeros(C)
                for ky in range(ratio):
                    for kx in range(ratio):
                        yy = y0 + (i + (ky + 0.5) / ratio) * bh
                        xx = x0 + (j + (kx + 0.5) / ratio) * bw
                        acc += bilinear(yy, xx)
                out[r, i, j] = acc / (ratio * ratio)
    return out


def test_pairwise_iou(rng):
    b1 = _rand_boxes(rng, 12)
    b2 = _rand_boxes(rng, 9)
    ours = np.asarray(pairwise_iou_xyxy(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(ours, _np_iou(b1, b2), atol=1e-5)


@pytest.mark.parametrize("iou_t", [0.3, 0.5, 0.7])
def test_nms_matches_oracle(rng, iou_t):
    for trial in range(3):
        boxes = _rand_boxes(rng, 40)
        scores = rng.uniform(size=40).astype(np.float32)
        keep_idx, keep_valid = nms_padded(
            jnp.asarray(boxes), jnp.asarray(scores), iou_t, max_outputs=40
        )
        ours = np.asarray(keep_idx)[np.asarray(keep_valid)]
        ref = _np_nms(boxes, scores, iou_t)
        np.testing.assert_array_equal(ours, ref)


def test_nms_respects_invalid(rng):
    boxes = _rand_boxes(rng, 10)
    scores = rng.uniform(size=10).astype(np.float32)
    scores[5:] = -np.inf
    keep_idx, keep_valid = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 10)
    kept = np.asarray(keep_idx)[np.asarray(keep_valid)]
    assert np.all(kept < 5)
    assert set(kept.tolist()) == set(_np_nms(boxes, scores, 0.5).tolist())


def test_nms_max_outputs_truncates(rng):
    boxes = _rand_boxes(rng, 30)
    scores = rng.uniform(size=30).astype(np.float32)
    keep_idx, keep_valid = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.9, 5)
    ref = _np_nms(boxes, scores, 0.9)[:5]
    np.testing.assert_array_equal(np.asarray(keep_idx)[np.asarray(keep_valid)], ref)


def test_batched_class_nms(rng):
    boxes = np.tile(_rand_boxes(rng, 10), (2, 1))  # identical boxes, 2 classes
    scores = rng.uniform(size=20).astype(np.float32)
    labels = np.repeat([1, 2], 10).astype(np.int32)
    valid = np.ones(20, bool)
    keep_idx, keep_valid = batched_class_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
        jnp.asarray(valid), 0.5, 20,
    )
    ours = set(np.asarray(keep_idx)[np.asarray(keep_valid)].tolist())
    # oracle: per-class independent NMS
    ref = set()
    for cls in (1, 2):
        m = labels == cls
        s = scores.copy()
        s[~m] = -np.inf
        ref |= set(np.flatnonzero(m)[_np_nms(boxes[m], scores[m], 0.5)].tolist())
    assert ours == ref


def test_roi_align_matches_oracle(rng):
    H, W, C = 24, 32, 4
    feats = rng.normal(size=(H, W, C)).astype(np.float32)
    boxes = np.array(
        [[8.0, 8.0, 40.0, 32.0], [0.0, 0.0, 62.0, 46.0], [21.0, 6.4, 29.6, 19.8]],
        dtype=np.float32,
    )  # image coords at scale 0.5 -> feature coords
    ours = np.asarray(roi_align(jnp.asarray(feats), jnp.asarray(boxes), 7, 0.5, 2))
    ref = _np_roi_align(feats, boxes, 7, 0.5, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_roi_align_constant_features(rng):
    """Constant feature map -> every in-bounds bin equals the constant."""
    feats = np.full((16, 16, 3), 2.5, dtype=np.float32)
    boxes = np.array([[2.0, 2.0, 10.0, 10.0]], dtype=np.float32)
    out = np.asarray(roi_align(jnp.asarray(feats), jnp.asarray(boxes), 5, 1.0, 2))
    np.testing.assert_allclose(out, 2.5, atol=1e-6)


def test_multiscale_roi_align_levels(rng):
    """Level selection follows torchvision's LevelMapper: the absolute FPN
    level minus k_min=log2(strides[0]) indexes the feature list. A 224 px
    box pools from stride 16 (index 2), a 120 px box from stride 8 (index
    1) — NOT from the coarsest map (regression: the index was previously
    the unshifted absolute level)."""
    sizes = [(32, 32), (16, 16), (8, 8), (4, 4)]
    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(rng.normal(size=(h, w, 4)).astype(np.float32)) for h, w in sizes]
    boxes = jnp.asarray(
        [[0.0, 0, 20, 20], [0.0, 0, 120, 120], [0.0, 0, 110, 110]],
        dtype=jnp.float32)
    out = multiscale_roi_align(feats, strides, boxes, output_size=7)
    assert out.shape == (3, 7, 7, 4)
    # 20 px -> lvl floor(4+log2(20/224))=0 -> clamp to k_min=2 -> index 0
    small = np.asarray(roi_align(feats[0], boxes[:1], 7, 1 / 4, 2))
    np.testing.assert_allclose(np.asarray(out[0]), small[0], atol=1e-5)
    # 120 px -> lvl 3 -> index 1 (stride 8)
    mid = np.asarray(roi_align(feats[1], boxes[1:2], 7, 1 / 8, 2))
    np.testing.assert_allclose(np.asarray(out[1]), mid[0], atol=1e-5)
    # 110 px -> lvl 2 -> index 0 (stride 4)
    lo = np.asarray(roi_align(feats[0], boxes[2:3], 7, 1 / 4, 2))
    np.testing.assert_allclose(np.asarray(out[2]), lo[0], atol=1e-5)


def test_multiscale_roi_align_vs_torch_oracle(rng):
    """Full-value oracle for the op the reference consumes inside roi_heads
    (/root/reference/models/backbone_maskrcnn.py:91). torchvision is not
    installable here (no egress), so the oracle is the independent torch
    functional reimplementation of MultiScaleRoIAlign semantics from
    tests/test_detector_numeric_parity.py (level mapper + aligned=False
    roi_align); when torchvision IS importable it is used instead."""
    import torch

    sizes = [(32, 32), (16, 16), (8, 8), (4, 4)]
    strides = [4, 8, 16, 32]
    img = 128
    feats_np = [rng.normal(size=(h, w, 4)).astype(np.float32) for h, w in sizes]
    boxes_np = np.array(
        [[0.0, 0, 20, 20], [4.0, 8, 124, 120], [16.0, 16, 90, 100],
         [0.0, 0, 126, 126], [32.0, 32, 48, 44]], dtype=np.float32)

    ours = np.asarray(multiscale_roi_align(
        [jnp.asarray(f) for f in feats_np], strides, jnp.asarray(boxes_np),
        output_size=7, sampling_ratio=2))

    try:
        import torchvision
        from collections import OrderedDict

        m = torchvision.ops.MultiScaleRoIAlign(
            ["0", "1", "2", "3"], output_size=7, sampling_ratio=2)
        x = OrderedDict(
            (str(i), torch.from_numpy(f).permute(2, 0, 1)[None])
            for i, f in enumerate(feats_np))
        ref = m(x, [torch.from_numpy(boxes_np)], [(img, img)])
    except ImportError:
        from tests.test_detector_numeric_parity import t_roi_align_level

        tboxes = torch.from_numpy(boxes_np)
        w = (tboxes[:, 2] - tboxes[:, 0]).clamp(min=0)
        h = (tboxes[:, 3] - tboxes[:, 1]).clamp(min=0)
        lvl = torch.floor(4 + torch.log2(torch.sqrt(w * h) / 224 + 1e-6))
        lvl = lvl.clamp(2, 5).long() - 2
        ref = torch.zeros(len(boxes_np), 4, 7, 7)
        for li in range(4):
            sel = torch.where(lvl == li)[0]
            if len(sel):
                ref[sel] = t_roi_align_level(
                    torch.from_numpy(feats_np[li]).permute(2, 0, 1),
                    tboxes[sel], 1.0 / strides[li])
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_multiscale_roi_align_slab_matches_flat_oracle(rng):
    """The slab-gather path must reproduce the corner-gather oracle for
    every box geometry — including the adversarial 'wide' boxes whose
    x-span exceeds the fast path's 64-px window (full-image-width slivers
    landing on the fine levels), up to the documented wide_capacity."""
    from poet_tpu.ops.detection import (
        _multiscale_roi_align_flat,
        _multiscale_roi_align_slab,
    )

    shapes = [(120, 160), (60, 80), (30, 40), (15, 20)]
    C = 16
    feats = [jnp.asarray(rng.normal(size=(h, w, C)).astype(np.float32))
             for h, w in shapes]
    strides = [4, 8, 16, 32]

    n = 80
    x0 = rng.uniform(0, 600, n)
    y0 = rng.uniform(0, 440, n)
    w = rng.uniform(2, 300, n)
    h = rng.uniform(2, 300, n)
    normal = np.stack(
        [x0, y0, np.minimum(x0 + w, 640), np.minimum(y0 + h, 480)], 1)
    # full-width slivers: >62 feature px wide at their assigned level
    k = 30
    sliver_y = rng.uniform(0, 450, k)
    slivers = np.stack(
        [np.zeros(k), sliver_y, np.full(k, 640.0),
         sliver_y + rng.uniform(4, 24, k)], 1)
    boxes = jnp.asarray(np.concatenate([normal, slivers]).astype(np.float32))

    ref = _multiscale_roi_align_flat(feats, strides, boxes, 7, 2, 224, 4)
    out = _multiscale_roi_align_slab(feats, strides, boxes, 7, 2, 224, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    # beyond capacity the wide re-pool cannot cover every sliver: the
    # documented bound is 64 simultaneously-wide boxes. At exactly the
    # bound it must still be exact.
    many = jnp.asarray(
        np.concatenate([slivers, slivers + np.array([0, 1, 0, 1]) * 1.5,
                        slivers[:4]]).astype(np.float32))
    assert many.shape[0] == 64
    ref2 = _multiscale_roi_align_flat(feats, strides, many, 7, 2, 224, 4)
    out2 = _multiscale_roi_align_slab(feats, strides, many, 7, 2, 224, 4)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=1e-4)


def test_exact_class_nms_beats_candidate_cap_adversarially(rng):
    """VERDICT r2 #5: hundreds of near-tied clustered boxes above the real
    detections must not change the keep set. The exact per-class NMS (the
    production default) must match the uncapped offset-trick oracle, and the
    adversarial case must PROVE a 400-candidate cap would differ."""
    from poet_tpu.ops.detection import exact_class_nms_mask

    P, ncls = 600, 3
    # class 1: 500 near-identical high-score boxes stacked at one spot
    # (greedy NMS keeps exactly 1) + 99 well-separated low-score boxes that
    # survive suppression. A 400-candidate score cap admits only clustered
    # boxes and loses every separated one.
    boxes = np.zeros((P, ncls, 4), np.float32)
    scores = np.full((P, ncls), -np.inf, np.float32)
    cluster = np.array([450.0, 400.0, 470.0, 420.0], np.float32)  # off the grid
    for i in range(500):
        boxes[i, 1] = cluster + rng.uniform(-0.01, 0.01, 4).astype(np.float32)
        scores[i, 1] = 0.9 + i * 1e-6
    for i in range(99):
        x = 10.0 + 30.0 * (i % 20)
        y = 10.0 + 30.0 * (i // 20)
        boxes[500 + i, 1] = [x, y, x + 20, y + 20]
        scores[500 + i, 1] = 0.5
    boxes_pc = jnp.asarray(boxes.reshape(P * ncls, 4))
    scores_pc = jnp.asarray(scores.reshape(P * ncls))

    keep = np.asarray(exact_class_nms_mask(boxes_pc, scores_pc, ncls, 0.5))

    # uncapped oracle: offset-trick batched NMS over the full candidate set
    labels_pc = jnp.tile(jnp.arange(ncls), (P,))
    valid = jnp.isfinite(scores_pc)
    idx, val = batched_class_nms(
        boxes_pc, scores_pc, labels_pc, valid, 0.5, P * ncls)
    oracle = np.zeros(P * ncls, bool)
    oracle[np.asarray(idx)[np.asarray(val)]] = True
    np.testing.assert_array_equal(keep, oracle)

    # exact keeps 1 cluster survivor + all 99 separated boxes
    assert keep.sum() == 100
    # a 400-candidate cap saturates on the cluster: the separated boxes
    # never even enter its NMS -> it would return 1 detection, not 100
    cap_i = np.argsort(-np.asarray(scores_pc))[:400]
    assert not np.isin(np.arange(P * ncls)[keep], cap_i).all(), (
        "adversarial case no longer exercises the cap; strengthen it")


def test_multiscale_roi_align_pallas_matches_flat_oracle(rng):
    """The Pallas VMEM-resident-pyramid kernel (interpret mode on CPU) must
    reproduce the corner-gather oracle: normal boxes pooled in-kernel, plus
    slivers wider than the 64-px x-window exercising the exact wide-box
    re-pool fallback."""
    from poet_tpu.ops.detection import _multiscale_roi_align_flat
    from poet_tpu.ops.roi_align_pallas import multiscale_roi_align_pallas

    shapes = [(60, 80), (30, 40), (15, 20), (8, 10)]
    C = 8
    B = 2
    feats = [jnp.asarray(rng.normal(size=(B, h, w, C)).astype(np.float32))
             for h, w in shapes]
    strides = [4, 8, 16, 32]

    n = 20
    boxes = []
    for _ in range(B):
        x0 = rng.uniform(0, 280, n)
        y0 = rng.uniform(0, 200, n)
        w = rng.uniform(2, 150, n)
        h = rng.uniform(2, 150, n)
        normal = np.stack(
            [x0, y0, np.minimum(x0 + w, 320), np.minimum(y0 + h, 240)], 1)
        # full-width slivers: wider than the 64-px window on level 0
        k = 4
        sy = rng.uniform(0, 230, k)
        slivers = np.stack(
            [np.zeros(k), sy, np.full(k, 320.0), sy + rng.uniform(4, 16, k)], 1)
        boxes.append(np.concatenate([normal, slivers]))
    boxes = jnp.asarray(np.stack(boxes).astype(np.float32))

    out = multiscale_roi_align_pallas(
        feats, strides, boxes, output_size=7, sampling_ratio=2,
        wide_capacity=8, interpret=True)
    for b in range(B):
        ref = _multiscale_roi_align_flat(
            [f[b] for f in feats], strides, boxes[b], 7, 2, 224, 4)
        np.testing.assert_allclose(
            np.asarray(out[b]), np.asarray(ref), atol=2e-4)


def test_multiscale_roi_align_pallas_chunk_overrun_no_alias(rng):
    """Wide re-pool chunk overrun (ADVICE r4): when the last while_loop chunk
    slices past R, the pad entries must NOT alias box 0 in the scatter —
    they are padded with the out-of-range index R and dropped. Box 0 is the
    MILDEST violator so it sorts into the overrunning last chunk: with a
    zero-padded `order` the same scatter would hold index 0 twice with
    different values (its exact re-pool vs the pad's pre-update read) and
    undefined duplicate-scatter order could overwrite the exact result."""
    from poet_tpu.ops.detection import _multiscale_roi_align_flat
    from poet_tpu.ops.roi_align_pallas import multiscale_roi_align_pallas

    shapes = [(60, 80), (30, 40), (15, 20), (8, 10)]
    B, C, R = 1, 8, 6
    feats = [jnp.asarray(rng.normal(size=(B, h, w, C)).astype(np.float32))
             for h, w in shapes]
    strides = [4, 8, 16, 32]
    rows = [[0.0, 10.0, 262.0, 14.0]]            # box 0: mildest sliver
    for i in range(4):                           # 4 stronger violators
        y = 30.0 + 40 * i
        rows.append([0.0, y, 290.0 + 7 * i, y + 6.0])
    rows.append([40.0, 40.0, 90.0, 95.0])        # 1 normal box
    boxes = jnp.asarray(rows, jnp.float32)[None]  # (1, 6, 4)

    # Kw=4: 5 violators -> 2 chunks, second chunk slices order[4:8] past R=6
    out = multiscale_roi_align_pallas(
        feats, strides, boxes, output_size=7, sampling_ratio=2,
        wide_capacity=4, interpret=True)
    ref = _multiscale_roi_align_flat(
        [f[0] for f in feats], strides, boxes[0], 7, 2, 224, 4)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref), atol=2e-4)


def _exact_select_np(boxes_pc, scores_pc, ncls, iou_t, md):
    """Full exact per-class NMS + top-md selection (the fallback branch)."""
    from poet_tpu.ops.detection import exact_class_nms_mask

    keep = exact_class_nms_mask(jnp.asarray(boxes_pc), jnp.asarray(scores_pc),
                                ncls, iou_t)
    import jax

    top_s, sel = jax.lax.top_k(jnp.where(keep, jnp.asarray(scores_pc),
                                         -jnp.inf), md)
    valid = np.isfinite(np.asarray(top_s))
    sel = np.where(valid, np.asarray(sel), 0)
    return sel, valid


def test_pruned_class_nms_certified_and_exact(rng):
    """class_nms_select_pruned: on generic candidate sets the certificate
    holds and the selection is BIT-IDENTICAL to full exact per-class NMS +
    top-k (the property that makes the detect+pose fast path a pure perf
    rewrite, VERDICT r3 next #5)."""
    from poet_tpu.ops.detection import class_nms_select_pruned

    P, ncls, md, K = 300, 4, 20, 128
    PN = P * ncls
    boxes = np.tile(_rand_boxes(rng, P, 400.0)[:, None, :], (1, ncls, 1))
    boxes += rng.uniform(-2, 2, boxes.shape).astype(np.float32)
    scores = rng.uniform(0, 1, (P, ncls)).astype(np.float32)
    # mask most candidates (score_thresh-style) so some classes run dry
    scores = np.where(scores > 0.35, scores, -np.inf)
    boxes_pc = boxes.reshape(PN, 4).astype(np.float32)
    scores_pc = scores.reshape(PN)
    labels_pc = jnp.tile(jnp.arange(ncls), (P,))

    sel_p, valid_p, cert = class_nms_select_pruned(
        jnp.asarray(boxes_pc), jnp.asarray(scores_pc), labels_pc, 0.5, md, K)
    assert bool(cert), "generic case should certify (plenty kept)"
    sel_e, valid_e = _exact_select_np(boxes_pc, scores_pc, ncls, 0.5, md)
    np.testing.assert_array_equal(np.asarray(valid_p), valid_e)
    np.testing.assert_array_equal(np.asarray(sel_p), sel_e)


def test_pruned_class_nms_certificate_fails_when_prune_unsafe(rng):
    """The adversarial cluster case (where a bare top-k cap silently loses
    detections) must FAIL the certificate, so the caller's lax.cond falls
    back to full exact suppression."""
    from poet_tpu.ops.detection import class_nms_select_pruned

    P, ncls, md, K = 600, 3, 100, 400
    boxes = np.zeros((P, ncls, 4), np.float32)
    scores = np.full((P, ncls), -np.inf, np.float32)
    cluster = np.array([450.0, 400.0, 470.0, 420.0], np.float32)
    for i in range(500):
        boxes[i, 1] = cluster + rng.uniform(-0.01, 0.01, 4).astype(np.float32)
        scores[i, 1] = 0.9 + i * 1e-6
    for i in range(99):
        x = 10.0 + 30.0 * (i % 20)
        y = 10.0 + 30.0 * (i // 20)
        boxes[500 + i, 1] = [x, y, x + 20, y + 20]
        scores[500 + i, 1] = 0.5
    boxes_pc = boxes.reshape(P * ncls, 4)
    scores_pc = scores.reshape(P * ncls)
    labels_pc = jnp.tile(jnp.arange(ncls), (P,))

    _, _, cert = class_nms_select_pruned(
        jnp.asarray(boxes_pc), jnp.asarray(scores_pc), labels_pc, 0.5, md, K)
    assert not bool(cert), (
        "cluster starves the pruned keep set below max_detections while "
        "valid candidates were dropped — certificate must fail")


def test_pruned_class_nms_tie_at_boundary_not_certified(rng):
    """Float score TIES straddling the prune boundary must not certify:
    the md-th kept score equals the best dropped score, so ordering between
    them is ambiguous under pruning."""
    from poet_tpu.ops.detection import class_nms_select_pruned

    P, ncls, md, K = 300, 2, 100, 128
    PN = P * ncls
    boxes = np.zeros((PN, 4), np.float32)
    scores = np.full(PN, -np.inf, np.float32)
    # 200 well-separated same-score boxes of class 1 (all survive NMS);
    # more candidates than K, every score identical -> tie across boundary
    for i in range(200):
        x = 5.0 + 22.0 * (i % 25)
        y = 5.0 + 22.0 * (i // 25)
        boxes[i * ncls + 1] = [x, y, x + 18, y + 18]
        scores[i * ncls + 1] = 0.75
    labels_pc = jnp.tile(jnp.arange(ncls), (P,))

    sel_p, valid_p, cert = class_nms_select_pruned(
        jnp.asarray(boxes), jnp.asarray(scores), labels_pc, 0.5, md, K)
    assert not bool(cert)
    # the fallback (full exact path) still gets the right answer
    sel_e, valid_e = _exact_select_np(boxes, scores, ncls, 0.5, md)
    assert valid_e.sum() == md


def test_multiscale_roi_align_pallas_padded_output(rng):
    """padded_output=True must return the kernel's (Mo, Mo, Cp) block whose
    core equals the sliced output and whose pad positions are EXACT zeros
    (the padded-fc6 contract)."""
    from poet_tpu.ops.roi_align_pallas import multiscale_roi_align_pallas

    shapes = [(60, 80), (30, 40), (15, 20), (8, 10)]
    C, B, n = 8, 2, 12
    feats = [jnp.asarray(rng.normal(size=(B, h, w, C)).astype(np.float32))
             for h, w in shapes]
    strides = [4, 8, 16, 32]
    boxes = []
    for _ in range(B):
        x0 = rng.uniform(0, 280, n)
        y0 = rng.uniform(0, 200, n)
        w = rng.uniform(2, 150, n)
        h = rng.uniform(2, 150, n)
        boxes.append(np.stack(
            [x0, y0, np.minimum(x0 + w, 320), np.minimum(y0 + h, 240)], 1))
    boxes = jnp.asarray(np.stack(boxes).astype(np.float32))

    plain = multiscale_roi_align_pallas(
        feats, strides, boxes, output_size=7, sampling_ratio=2,
        interpret=True)
    padded = multiscale_roi_align_pallas(
        feats, strides, boxes, output_size=7, sampling_ratio=2,
        interpret=True, padded_output=True)
    assert padded.shape[2] == padded.shape[3] == 8
    np.testing.assert_array_equal(
        np.asarray(padded[:, :, :7, :7, :C]), np.asarray(plain))
    pad_vals = np.concatenate([
        np.asarray(padded[:, :, 7:]).ravel(),
        np.asarray(padded[:, :, :, 7:]).ravel(),
        np.asarray(padded[:, :, :, :, C:]).ravel(),
    ])
    np.testing.assert_array_equal(pad_vals, 0.0)


def test_multiscale_roi_align_pallas_wide_saturation_falls_back(rng):
    """VERDICT r3 next #7: MORE x-window violators per image than
    `wide_capacity` must trigger the whole-batch slab fallback, so the
    result still matches the oracle EXACTLY (no silently clipped box #17+)."""
    from poet_tpu.ops.detection import _multiscale_roi_align_flat
    from poet_tpu.ops.roi_align_pallas import multiscale_roi_align_pallas

    shapes = [(60, 80), (30, 40), (15, 20), (8, 10)]
    C, B = 8, 2
    feats = [jnp.asarray(rng.normal(size=(B, h, w, C)).astype(np.float32))
             for h, w in shapes]
    strides = [4, 8, 16, 32]
    boxes = []
    for _ in range(B):
        # 12 full-width slivers (every one violates the 64-px x-window on
        # level 0) + 4 normal boxes, with wide_capacity=8 < 12
        k = 12
        sy = rng.uniform(0, 220, k)
        slivers = np.stack(
            [np.zeros(k), sy, np.full(k, 320.0), sy + rng.uniform(4, 16, k)], 1)
        x0 = rng.uniform(0, 250, 4)
        y0 = rng.uniform(0, 180, 4)
        normal = np.stack([x0, y0, x0 + 40, y0 + 40], 1)
        boxes.append(np.concatenate([slivers, normal]))
    boxes = jnp.asarray(np.stack(boxes).astype(np.float32))

    out = multiscale_roi_align_pallas(
        feats, strides, boxes, output_size=7, sampling_ratio=2,
        wide_capacity=8, interpret=True)
    for b in range(B):
        ref = _multiscale_roi_align_flat(
            [f[b] for f in feats], strides, boxes[b], 7, 2, 224, 4)
        np.testing.assert_allclose(
            np.asarray(out[b]), np.asarray(ref), atol=2e-4)


def test_two_mlp_head_padded_matches_plain(rng):
    """Zero-padded HWC fc6 consumption must equal torchvision's (C,7,7)
    flatten bit-for-bit in f32 (zero weights kill the pad positions)."""
    import jax

    from poet_tpu.models.maskrcnn import TwoMLPHead

    N, o, C, Mo, Cp = 6, 7, 16, 8, 16
    pooled = rng.normal(size=(N, o, o, C)).astype(np.float32)
    padded = np.zeros((N, Mo, Mo, Cp), np.float32)
    padded[:, :o, :o, :C] = pooled

    head_plain = TwoMLPHead()
    head_pad = TwoMLPHead(padded_in=(Mo, Mo, Cp, C))
    x_plain = jnp.asarray(pooled.transpose(0, 3, 1, 2).reshape(N, -1))
    params = head_plain.init(jax.random.PRNGKey(0), x_plain)
    out_plain = head_plain.apply(params, x_plain)
    out_pad = head_pad.apply(params, jnp.asarray(padded.reshape(N, -1)))
    np.testing.assert_allclose(np.asarray(out_pad), np.asarray(out_plain),
                               atol=1e-5)
