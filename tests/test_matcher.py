"""PoseMatcher parity vs a scipy-based oracle implementing the reference
semantics (rectangular LSA on the valid sub-matrix + backbone-mode filters)."""

import numpy as np
from scipy.optimize import linear_sum_assignment

import jax
import jax.numpy as jnp

from poet_tpu.models.matcher import match_poses


def _oracle(pred_boxes, pred_classes, tgt_boxes, tgt_labels, n_pred, n_tgt,
            bbox_mode, class_mode="specific", cost_bbox=1.0, cost_class=1.0,
            giou_thresh=0.5):
    """Reference-semantics matcher in numpy/scipy (independent oracle)."""
    B, Q = pred_classes.shape
    out = []
    for b in range(B):
        np_, nt = n_pred[b], n_tgt[b]
        pb, pc = pred_boxes[b][:np_], pred_classes[b][:np_]
        tb, tc = tgt_boxes[b][:nt], tgt_labels[b][:nt]
        if bbox_mode == "gt":
            C = np.abs(pb[:, None] - tb[None]).sum(-1) * cost_bbox
        elif bbox_mode == "jitter":
            C = (pc[:, None] != tc[None]).astype(np.float32) * cost_class
        else:
            C = cost_bbox * np.abs(pb[:, None, :2] - tb[None, :, :2]).sum(-1)
            C = C + cost_class * (pc[:, None] != tc[None]).astype(np.float32)
        ri, ci = linear_sum_assignment(C)
        pairs = list(zip(ri.tolist(), ci.tolist()))
        if bbox_mode == "backbone":
            kept = []
            for i, j in pairs:
                if class_mode == "specific" and pc[i] != tc[j]:
                    continue
                if _giou(_xyxy(pb[i]), _xyxy(tb[j])) < giou_thresh:
                    continue
                kept.append((i, j))
            pairs = kept
        out.append(set(pairs))
    return out


def _xyxy(b):
    cx, cy, w, h = b
    return np.array([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])


def _giou(b1, b2):
    a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
    a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
    iw = max(0.0, min(b1[2], b2[2]) - max(b1[0], b2[0]))
    ih = max(0.0, min(b1[3], b2[3]) - max(b1[1], b2[1]))
    inter = iw * ih
    union = a1 + a2 - inter
    ew = max(b1[2], b2[2]) - min(b1[0], b2[0])
    eh = max(b1[3], b2[3]) - min(b1[1], b2[1])
    return inter / union - (ew * eh - union) / (ew * eh)


def _matched_pairs(result, n_pred):
    tgt_idx = np.asarray(result.tgt_idx)
    valid = np.asarray(result.valid)
    return [
        {(i, int(tgt_idx[b, i])) for i in range(tgt_idx.shape[1]) if valid[b, i]}
        for b in range(tgt_idx.shape[0])
    ]


def _random_problem(rng, B=4, Q=8, mode="gt"):
    boxes = rng.uniform(0.1, 0.9, size=(B, Q, 4)).astype(np.float32)
    boxes[..., 2:] = rng.uniform(0.05, 0.3, size=(B, Q, 2))
    tgt_boxes = boxes + rng.normal(scale=0.01, size=boxes.shape).astype(np.float32)
    labels = rng.integers(1, 5, size=(B, Q)).astype(np.int32)
    n = rng.integers(1, Q + 1, size=(B,)).astype(np.int32)
    return boxes, labels, tgt_boxes.astype(np.float32), labels.copy(), n


def test_gt_mode_matches_oracle(rng):
    boxes, labels, tgt_boxes, tgt_labels, n = _random_problem(rng)
    res = match_poses(
        jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(tgt_boxes),
        jnp.asarray(tgt_labels), jnp.asarray(n), jnp.asarray(n), bbox_mode="gt",
    )
    expected = _oracle(boxes, labels, tgt_boxes, tgt_labels, n, n, "gt")
    assert _matched_pairs(res, n) == expected


def test_gt_mode_rectangular(rng):
    """More predictions than targets and vice versa."""
    boxes, labels, tgt_boxes, tgt_labels, _ = _random_problem(rng, B=3, Q=6)
    n_pred = np.array([6, 3, 5], dtype=np.int32)
    n_tgt = np.array([4, 6, 5], dtype=np.int32)
    res = match_poses(
        jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(tgt_boxes),
        jnp.asarray(tgt_labels), jnp.asarray(n_pred), jnp.asarray(n_tgt), bbox_mode="gt",
    )
    expected = _oracle(boxes, labels, tgt_boxes, tgt_labels, n_pred, n_tgt, "gt")
    assert _matched_pairs(res, n_pred) == expected
    # match count = min(n_pred, n_tgt)
    counts = np.asarray(res.valid).sum(1)
    np.testing.assert_array_equal(counts, np.minimum(n_pred, n_tgt))


def test_jitter_mode(rng):
    """Jitter mode matches purely by class (perfect 1:1 in the reference)."""
    B, Q = 2, 5
    labels = np.array([[1, 2, 3, 4, 5], [3, 1, 2, -1, -1]], dtype=np.int32)
    # targets: same classes, shuffled
    tgt_labels = np.array([[5, 4, 3, 2, 1], [2, 3, 1, -1, -1]], dtype=np.int32)
    boxes = rng.uniform(0.2, 0.8, size=(B, Q, 4)).astype(np.float32)
    n = np.array([5, 3], dtype=np.int32)
    res = match_poses(
        jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(boxes),
        jnp.asarray(tgt_labels), jnp.asarray(n), jnp.asarray(n), bbox_mode="jitter",
    )
    tgt_idx = np.asarray(res.tgt_idx)
    valid = np.asarray(res.valid)
    for b in range(B):
        for i in range(n[b]):
            assert valid[b, i]
            assert labels[b, i] == tgt_labels[b, tgt_idx[b, i]]


def test_backbone_mode_filters(rng):
    """Backbone mode drops class mismatches and low-GIoU matches."""
    B, Q = 1, 4
    pred_boxes = np.array([[[0.3, 0.3, 0.2, 0.2],
                            [0.7, 0.7, 0.2, 0.2],
                            [0.1, 0.9, 0.1, 0.1],
                            [-1, -1, -1, -1]]], dtype=np.float32)
    pred_classes = np.array([[1, 2, 3, -1]], dtype=np.int32)
    # tgt 0 overlaps pred 0 same class; tgt 1 overlaps pred 1 WRONG class;
    # tgt 2 far from pred 2 (low giou)
    tgt_boxes = np.array([[[0.31, 0.3, 0.2, 0.2],
                           [0.7, 0.69, 0.2, 0.2],
                           [0.9, 0.1, 0.1, 0.1],
                           [-1, -1, -1, -1]]], dtype=np.float32)
    tgt_labels = np.array([[1, 9, 3, -1]], dtype=np.int32)
    n_pred = np.array([3], dtype=np.int32)
    n_tgt = np.array([3], dtype=np.int32)
    res = match_poses(
        jnp.asarray(pred_boxes), jnp.asarray(pred_classes), jnp.asarray(tgt_boxes),
        jnp.asarray(tgt_labels), jnp.asarray(n_pred), jnp.asarray(n_tgt),
        bbox_mode="backbone", class_mode="specific",
    )
    pairs = _matched_pairs(res, n_pred)[0]
    expected = _oracle(pred_boxes, pred_classes, tgt_boxes, tgt_labels,
                       n_pred, n_tgt, "backbone")[0]
    assert pairs == expected == {(0, 0)}


def test_backbone_mode_matches_oracle_random(rng):
    for trial in range(5):
        boxes, labels, tgt_boxes, tgt_labels, n = _random_problem(rng, B=4, Q=6)
        # perturb classes so some mismatch
        labels2 = labels.copy()
        flip = rng.uniform(size=labels.shape) < 0.3
        labels2[flip] = labels2[flip] + 1
        res = match_poses(
            jnp.asarray(boxes), jnp.asarray(labels2), jnp.asarray(tgt_boxes),
            jnp.asarray(tgt_labels), jnp.asarray(n), jnp.asarray(n),
            bbox_mode="backbone", class_mode="specific",
        )
        expected = _oracle(boxes, labels2, tgt_boxes, tgt_labels, n, n, "backbone")
        assert _matched_pairs(res, n) == expected


def test_matcher_jits(rng):
    boxes, labels, tgt_boxes, tgt_labels, n = _random_problem(rng)
    fn = jax.jit(
        lambda a, b, c, d, e, f: match_poses(a, b, c, d, e, f, bbox_mode="gt")
    )
    res = fn(jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(tgt_boxes),
             jnp.asarray(tgt_labels), jnp.asarray(n), jnp.asarray(n))
    assert res.tgt_idx.shape == (4, 8)


def test_legacy_hungarian_matcher(rng):
    """DETR-style matcher: focal class + L1 + GIoU vs a scipy oracle."""
    from poet_tpu.models.matcher import match_hungarian

    B, Q, C = 2, 6, 5
    logits = rng.normal(size=(B, Q, C)).astype(np.float32)
    boxes = rng.uniform(0.2, 0.6, size=(B, Q, 4)).astype(np.float32)
    boxes[..., 2:] = rng.uniform(0.05, 0.3, size=(B, Q, 2))
    tgt_boxes = rng.uniform(0.2, 0.6, size=(B, Q, 4)).astype(np.float32)
    tgt_boxes[..., 2:] = rng.uniform(0.05, 0.3, size=(B, Q, 2))
    labels = rng.integers(0, C, size=(B, Q)).astype(np.int32)
    n_tgt = np.array([4, 6], dtype=np.int32)

    res = match_hungarian(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(tgt_boxes),
        jnp.asarray(labels), jnp.asarray(n_tgt),
    )

    # scipy oracle with the same costs
    import scipy.special

    for b in range(B):
        prob = scipy.special.expit(logits[b])
        p = prob[:, labels[b, : n_tgt[b]]]
        alpha, gamma = 0.25, 2.0
        neg = (1 - alpha) * p**gamma * (-np.log(1 - p + 1e-8))
        pos = alpha * (1 - p) ** gamma * (-np.log(p + 1e-8))
        cls = pos - neg
        l1 = np.abs(boxes[b][:, None] - tgt_boxes[b, : n_tgt[b]][None]).sum(-1)
        from tests.test_matcher import _xyxy, _giou

        g = np.array([[_giou(_xyxy(bb), _xyxy(tb)) for tb in tgt_boxes[b, : n_tgt[b]]]
                      for bb in boxes[b]])
        Cm = 1.0 * l1 + 1.0 * cls - 2.0 * g
        ri, ci = linear_sum_assignment(Cm)
        expected = set(zip(ri.tolist(), ci.tolist()))
        got = {
            (i, int(np.asarray(res.tgt_idx)[b, i]))
            for i in range(Q)
            if np.asarray(res.valid)[b, i]
        }
        assert got == expected


def test_identity_shortcut_is_exact():
    """The certified identity shortcut: aligned (training-shaped) inputs
    take the identity branch; shuffled inputs take the JV branch — both
    must equal scipy's optimum."""
    from scipy.optimize import linear_sum_assignment

    rng = np.random.default_rng(11)
    B, Q = 3, 7
    boxes = rng.uniform(0.1, 0.9, (B, Q, 4)).astype(np.float32)
    labels = rng.integers(1, 5, (B, Q)).astype(np.int32)
    n = np.array([7, 4, 6], dtype=np.int32)

    # aligned: pred == tgt row-for-row (gt-mode construction)
    res = match_poses(jnp.asarray(boxes), jnp.asarray(labels),
                      jnp.asarray(boxes), jnp.asarray(labels),
                      jnp.asarray(n), jnp.asarray(n), bbox_mode="gt")
    np.testing.assert_array_equal(
        np.asarray(res.tgt_idx), np.tile(np.arange(Q), (B, 1)))

    # shuffled columns: identity is NOT optimal; must match scipy exactly
    perm = np.stack([rng.permutation(Q) for _ in range(B)])
    tgt_boxes = np.take_along_axis(boxes, perm[:, :, None], axis=1)
    tgt_labels = np.take_along_axis(labels, perm, axis=1)
    res2 = match_poses(jnp.asarray(boxes), jnp.asarray(labels),
                       jnp.asarray(tgt_boxes), jnp.asarray(tgt_labels),
                       jnp.asarray(n), jnp.asarray(n), bbox_mode="gt")
    for b in range(B):
        C = np.abs(boxes[b, :, None, :] - tgt_boxes[b, None, :, :]).sum(-1)
        C = C.astype(np.float64)
        C[n[b]:, :] = 1e6
        C[:, n[b]:] = 1e6
        rr, cc = linear_sum_assignment(C)
        ours = np.asarray(res2.tgt_idx)[b]
        # same total cost (optima may tie); valid prefix must be optimal
        assert np.isclose(C[np.arange(Q), ours].sum(), C[rr, cc].sum())
