"""Mask R-CNN detection path: structure, decoding, end-to-end backbone mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from poet_tpu.models.maskrcnn import (
    MaskRCNNDetector,
    decode_boxes,
    generate_anchors,
)


def test_generate_anchors_structure():
    grid_sizes = [(8, 8), (4, 4)]
    strides = [4, 8]
    anchors = generate_anchors(grid_sizes, strides, sizes=((32,), (64,)))
    assert anchors[0].shape == (8 * 8 * 3, 4)
    assert anchors[1].shape == (4 * 4 * 3, 4)
    # first anchor at (0,0): ratio 0.5 -> h = 32*sqrt(.5)=22.6->23, w = 32/sqrt(.5)=45.25->45
    a0 = anchors[0][0]
    np.testing.assert_allclose(a0, [-23.0, -11.0, 23.0, 11.0])
    # ratio 1.0 anchor
    a1 = anchors[0][1]
    np.testing.assert_allclose(a1, [-16.0, -16.0, 16.0, 16.0])
    # second grid cell shifted by stride
    np.testing.assert_allclose(anchors[0][3] - a0, [4.0, 0, 4.0, 0])


def test_decode_boxes_identity():
    anchors = jnp.asarray([[10.0, 10, 30, 50]])
    deltas = jnp.zeros((1, 4))
    out = np.asarray(decode_boxes(deltas, anchors))
    np.testing.assert_allclose(out, [[10, 10, 30, 50]], atol=1e-5)


def test_decode_boxes_shift_scale():
    anchors = jnp.asarray([[0.0, 0, 20, 10]])  # w=20 h=10 c=(10,5)
    deltas = jnp.asarray([[0.5, -0.2, np.log(2.0), np.log(0.5)]])
    out = np.asarray(decode_boxes(deltas, anchors))
    # cx = 10 + 0.5*20 = 20; cy = 5 - 0.2*10 = 3; w = 40; h = 5
    np.testing.assert_allclose(out, [[0.0, 0.5, 40.0, 5.5]], atol=1e-4)


@pytest.fixture(scope="module")
def detector_outputs():
    rng = np.random.default_rng(3)
    H, W = 64, 64
    feats = {}
    for name, stride in zip(["0", "1", "2", "3", "pool"], [4, 8, 16, 32, 64]):
        feats[name] = jnp.asarray(
            rng.normal(size=(2, H // stride, W // stride, 256)).astype(np.float32)
        )
    det = MaskRCNNDetector(num_classes=5, max_detections=10)
    params = det.init(jax.random.PRNGKey(0), feats, (H, W))
    out = det.apply(params, feats, (H, W))
    return out


def test_detector_output_shapes(detector_outputs):
    out = detector_outputs
    assert out["boxes"].shape == (2, 10, 4)
    assert out["scores"].shape == (2, 10)
    assert out["labels"].shape == (2, 10)
    assert out["valid"].shape == (2, 10)


def test_detector_output_sanity(detector_outputs):
    out = detector_outputs
    valid = np.asarray(out["valid"])
    boxes = np.asarray(out["boxes"])
    labels = np.asarray(out["labels"])
    scores = np.asarray(out["scores"])
    # valid detections: in-frame boxes, foreground labels, score > thresh
    for b in range(2):
        for k in range(10):
            if valid[b, k]:
                assert 0 <= boxes[b, k, 0] <= boxes[b, k, 2] <= 64
                assert 0 <= boxes[b, k, 1] <= boxes[b, k, 3] <= 64
                assert 1 <= labels[b, k] <= 4
                assert scores[b, k] > 0.05
            else:
                assert labels[b, k] == -1


def test_backbone_mode_end_to_end(rng):
    """Full PoET with detector backbone in bbox_mode='backbone'."""
    from tests.test_model import tiny_config, make_batch
    from poet_tpu.models import build_model

    cfg = tiny_config(bbox_mode="backbone")
    cfg.backbone.max_detections = 8
    model = build_model(cfg)
    images, pad_mask, targets = make_batch(rng, B=2, H=64, W=64)
    params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)
    out = model.apply(params, images, pad_mask, targets)
    assert out["translations"].shape == (2, 2, 5, 3)
    assert out["pred_boxes"].shape == (2, 5, 4)
    # boxes normalized cxcywh for valid slots; untrained net may detect 0..K
    n = np.asarray(out["n_boxes"])
    assert np.all(n >= 0) and np.all(n <= 5)


def test_detector_bf16_heads_match_f32(rng):
    """dtype=bf16 detector heads (r5): RPN convs + fc6/fc7 + predictor in
    bf16 with all ranking arithmetic f32 must keep proposals/detections
    consistent with the f32 path — same traced program structure, outputs
    within bf16 round-off. Uses shared params (heads keep f32 leaves at
    rest; flax casts in-program)."""
    H, W = 64, 64
    feats = {}
    for name, stride in zip(["0", "1", "2", "3", "pool"], [4, 8, 16, 32, 64]):
        feats[name] = jnp.asarray(
            rng.normal(size=(2, H // stride, W // stride, 256)).astype(np.float32))
    det32 = MaskRCNNDetector(num_classes=5, max_detections=10)
    params = det32.init(jax.random.PRNGKey(0), feats, (H, W))
    out32 = det32.apply(params, feats, (H, W))

    det16 = MaskRCNNDetector(num_classes=5, max_detections=10,
                             dtype=jnp.bfloat16)
    feats16 = {k: v.astype(jnp.bfloat16) for k, v in feats.items()}
    out16 = det16.apply(params, feats16, (H, W))

    # bf16 round-off reorders near-tied scores and flips borderline
    # detections, so compare as SETS: most f32 detections must have a bf16
    # counterpart with the same label and a nearby box.
    matched = total = 0
    for b in range(2):
        v32 = np.asarray(out32["valid"][b])
        v16 = np.asarray(out16["valid"][b])
        d32 = [(int(l), np.asarray(bx)) for l, bx, v in
               zip(out32["labels"][b], out32["boxes"][b], v32) if v]
        d16 = [(int(l), np.asarray(bx)) for l, bx, v in
               zip(out16["labels"][b], out16["boxes"][b], v16) if v]
        for l, bx in d32:
            total += 1
            if any(l == l2 and np.abs(bx - bx2).max() < 2.0 for l2, bx2 in d16):
                matched += 1
    assert total > 0, "f32 path produced no detections — weak test"
    assert matched / total >= 0.7, f"set agreement {matched}/{total}"


def test_yaml_anchor_sizes_change_proposals(rng, tmp_path):
    """A rcnn YAML with non-default anchor_sizes must drive the anchor
    generator (VERDICT r1 item 5). Same params + image, different anchors =>
    different detector boxes."""
    import yaml

    from poet_tpu.config import PoETConfig
    from poet_tpu.models import build_model

    def make_cfg(anchor_sizes):
        doc = {
            "backbone_str": "resnet50-fpn",
            "input_resize": [64, 64],
            "label_to_category_id": {"background": 0, "obj_1": 1, "obj_2": 2},
        }
        if anchor_sizes is not None:
            doc["anchor_sizes"] = anchor_sizes
        path = tmp_path / f"rcnn_{id(anchor_sizes)}.yaml"
        path.write_text(yaml.safe_dump(doc))
        cfg = PoETConfig()
        cfg.backbone.name = "maskrcnn"
        cfg.backbone.cfg_path = str(path)
        cfg.backbone.max_detections = 8
        cfg.model.bbox_mode = "backbone"
        cfg.model.hidden_dim = 64
        cfg.model.nheads = 4
        cfg.model.enc_layers = 1
        cfg.model.dec_layers = 1
        cfg.model.dim_feedforward = 128
        cfg.model.num_queries = 5
        cfg.model.n_classes = 2
        cfg.model.dropout = 0.0
        return cfg

    cfg_default = make_cfg([[32], [64], [128], [256], [512]])
    cfg_custom = make_cfg([[8], [16], [32], [64], [128]])
    assert cfg_custom.backbone.anchor_sizes is None  # set during build
    images = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    pad_mask = jnp.zeros((1, 64, 64), dtype=bool)

    del images, pad_mask
    # YAML -> config -> module plumbing
    model_a = build_model(cfg_default)
    assert cfg_default.backbone.anchor_sizes == ((32,), (64,), (128,), (256,), (512,))
    assert model_a.backbone.anchor_sizes == ((32,), (64,), (128,), (256,), (512,))
    model_b = build_model(cfg_custom)
    assert cfg_custom.backbone.anchor_sizes == ((8,), (16,), (32,), (64,), (128,))
    assert model_b.backbone.anchor_sizes == ((8,), (16,), (32,), (64,), (128,))

    # behavioral check on the detector itself (well-scaled random features;
    # full ResNet features at init are huge and decode to identical clipped
    # garbage in both cases)
    from poet_tpu.models.maskrcnn import MaskRCNNDetector

    feats = {k: jnp.asarray(rng.normal(size=(1, s, s, 256)).astype(np.float32))
             for k, s in zip(["0", "1", "2", "3", "pool"], [16, 8, 4, 2, 1])}
    det_a = MaskRCNNDetector(num_classes=3, max_detections=8,
                             anchor_sizes=model_a.backbone.anchor_sizes)
    det_b = MaskRCNNDetector(num_classes=3, max_detections=8,
                             anchor_sizes=model_b.backbone.anchor_sizes)
    params = det_a.init(jax.random.PRNGKey(0), feats, (64, 64))
    out_a = det_a.apply(params, feats, (64, 64))
    out_b = det_b.apply(params, feats, (64, 64))
    assert not np.allclose(np.asarray(out_a["boxes"]), np.asarray(out_b["boxes"]))


def test_detector_pruned_nms_matches_full_exact():
    """The certified score-pruned exact-NMS fast path (nms_prune_k) must be
    output-IDENTICAL to full exact suppression (nms_prune_k=0) end-to-end —
    same features, same params, both branches of the whole-batch cond."""
    rng = np.random.default_rng(7)
    H, W = 64, 64
    feats = {}
    for name, stride in zip(["0", "1", "2", "3", "pool"], [4, 8, 16, 32, 64]):
        feats[name] = jnp.asarray(
            rng.normal(size=(2, H // stride, W // stride, 256)).astype(np.float32)
        )
    # PN = post_nms_top_n * num_classes = 320 > prune_k=160 > max_detections
    det_fast = MaskRCNNDetector(num_classes=5, max_detections=10,
                                post_nms_top_n=64, nms_prune_k=160)
    det_full = MaskRCNNDetector(num_classes=5, max_detections=10,
                                post_nms_top_n=64, nms_prune_k=0)
    params = det_fast.init(jax.random.PRNGKey(0), feats, (H, W))
    out_fast = det_fast.apply(params, feats, (H, W))
    out_full = det_full.apply(params, feats, (H, W))
    for k in ["boxes", "scores", "labels", "valid"]:
        np.testing.assert_array_equal(np.asarray(out_fast[k]),
                                      np.asarray(out_full[k]), err_msg=k)
