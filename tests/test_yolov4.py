"""YOLOv4-CSP backbone: cfg parsing, graph execution, decode, NMS."""

import os
import textwrap

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from poet_tpu.models.yolov4 import (
    DarknetBody,
    YOLOv4Backbone,
    decode_yolo_u5,
    load_cfg_sections,
    mish,
    parse_darknet_cfg,
)

MINI_CFG = textwrap.dedent(
    """
    [net]
    width=64
    height=64
    channels=3

    [convolutional]
    batch_normalize=1
    filters=8
    size=3
    stride=2
    pad=1
    activation=mish

    [convolutional]
    batch_normalize=1
    filters=16
    size=3
    stride=2
    pad=1
    activation=mish

    # CSP-ish split
    [route]
    layers = -1

    [convolutional]
    batch_normalize=1
    filters=16
    size=1
    stride=1
    pad=1
    activation=mish

    [shortcut]
    from=-2
    activation=linear

    [maxpool]
    stride=1
    size=5

    [route]
    layers = -1,-2

    [convolutional]
    batch_normalize=1
    filters=16
    size=1
    stride=1
    pad=1
    activation=leaky

    [convolutional]
    batch_normalize=1
    filters=16
    size=3
    stride=2
    pad=1
    activation=mish

    [convolutional]
    size=1
    stride=1
    pad=1
    filters=21
    activation=linear

    [yolo]
    mask = 0,1,2
    anchors = 10,13, 16,30, 33,23, 30,61, 62,45, 59,119, 116,90, 156,198, 373,326
    classes=2
    num=9
    scale_x_y = 1.05

    [route]
    layers = -4

    [upsample]
    stride=2

    [convolutional]
    size=1
    stride=1
    pad=1
    filters=21
    activation=linear

    [yolo]
    mask = 3,4,5
    anchors = 10,13, 16,30, 33,23, 30,61, 62,45, 59,119, 116,90, 156,198, 373,326
    classes=2
    num=9
    """
)


def test_parse_cfg():
    sections = parse_darknet_cfg(MINI_CFG)
    assert sections[0]["type"] == "net"
    types = [s["type"] for s in sections]
    assert types.count("convolutional") == 7
    assert types.count("yolo") == 2
    assert sections[1]["activation"] == "mish"


def test_mish():
    x = jnp.asarray([-2.0, 0.0, 3.0])
    out = np.asarray(mish(x))
    expected = np.asarray(x) * np.tanh(np.log1p(np.exp(np.asarray(x))))
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_mish_fast_rewrite():
    """The one-exp rewrite matches x*tanh(softplus(x)) over a wide range,
    stays exact (== x or == 0) at the extremes, and its autodiff gradient
    is finite everywhere (the clamp guard keeps exp out of overflow)."""
    x = jnp.linspace(-80.0, 80.0, 20001)
    out = np.asarray(mish(x))
    xn = np.asarray(x, np.float64)
    expected = np.where(xn > 30, xn, xn * np.tanh(np.log1p(np.exp(np.minimum(xn, 30)))))
    np.testing.assert_allclose(out, expected, atol=5e-6)
    g = np.asarray(jax.vmap(jax.grad(mish))(x))
    assert np.all(np.isfinite(g))
    # grad matches the textbook formulation away from the clamp
    g_ref = np.asarray(
        jax.vmap(jax.grad(lambda v: v * jnp.tanh(jax.nn.softplus(v))))(
            jnp.clip(x, -30.0, 20.0)))
    mask = np.abs(xn) < 20
    np.testing.assert_allclose(g[mask], g_ref[mask], atol=5e-6)


def test_darknet_body_shapes(rng):
    sections = tuple(tuple(sorted(s.items())) for s in parse_darknet_cfg(MINI_CFG))
    body = DarknetBody(sections)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    params = body.init(jax.random.PRNGKey(0), x)
    yolo_inputs, yolo_specs, features = body.apply(params, x)
    assert len(yolo_inputs) == 2 and len(features) == 2
    assert yolo_inputs[0].shape == (1, 8, 8, 21)     # 3*(5+2) = 21
    assert yolo_inputs[1].shape == (1, 32, 32, 21)  # upsampled head
    assert yolo_specs[0]["anchors"] == [(10, 13), (16, 30), (33, 23)]
    assert yolo_specs[1]["anchors"] == [(30, 61), (62, 45), (59, 119)]


def test_decode_yolo_u5_geometry(rng):
    """Zero logits -> sigmoid 0.5 -> xy at cell centers, wh = anchor."""
    B, H, W, A, nc = 1, 4, 4, 3, 2
    raw = jnp.zeros((B, H, W, A * (5 + nc)))
    anchors = [(10, 13), (16, 30), (33, 23)]
    boxes, scores = decode_yolo_u5(raw, anchors, nc, stride=8)
    boxes = np.asarray(boxes).reshape(H, W, A, 4)
    # sigmoid(0)*2-0.5 = 0.5 -> center = (gx + 0.5)*stride
    cx = (boxes[0, 0, 0, 0] + boxes[0, 0, 0, 2]) / 2
    np.testing.assert_allclose(cx, 0.5 * 8, atol=1e-5)
    # wh = (2*0.5)^2 * anchor = anchor
    w0 = boxes[0, 0, 0, 2] - boxes[0, 0, 0, 0]
    np.testing.assert_allclose(w0, 10.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(scores), 0.25, atol=1e-6)  # 0.5*0.5


def test_decode_yolo_darknet_geometry(rng):
    """Classic darknet decode: zero logits -> xy at cell centers for any
    scale_x_y (σ·s − (s−1)/2 = 0.5), wh = exp(0)·anchor = anchor; and
    random logits match a numpy transcription of darknet's get_yolo_box."""
    from poet_tpu.models.yolov4 import decode_yolo_darknet

    B, H, W, A, nc = 1, 4, 4, 3, 2
    anchors = [(10, 13), (16, 30), (33, 23)]
    raw0 = jnp.zeros((B, H, W, A * (5 + nc)))
    boxes, _ = decode_yolo_darknet(raw0, anchors, nc, stride=8, scale_x_y=1.05)
    boxes = np.asarray(boxes).reshape(H, W, A, 4)
    cx = (boxes[0, 0, 0, 0] + boxes[0, 0, 0, 2]) / 2
    np.testing.assert_allclose(cx, 0.5 * 8, atol=1e-5)
    np.testing.assert_allclose(boxes[0, 0, 0, 2] - boxes[0, 0, 0, 0], 10.0,
                               atol=1e-5)

    raw = rng.normal(size=(B, H, W, A * (5 + nc))).astype(np.float32)
    ours, _ = decode_yolo_darknet(jnp.asarray(raw), anchors, nc, stride=8,
                                  scale_x_y=1.05)
    ours = np.asarray(ours).reshape(H, W, A, 4)
    r = raw.reshape(B, H, W, A, 5 + nc)[0]
    sig = lambda x: 1.0 / (1.0 + np.exp(-x))
    for (gy, gx, a) in [(0, 0, 0), (2, 3, 1), (3, 1, 2)]:
        cx = (sig(r[gy, gx, a, 0]) * 1.05 - 0.025 + gx) * 8
        cy = (sig(r[gy, gx, a, 1]) * 1.05 - 0.025 + gy) * 8
        w = np.exp(r[gy, gx, a, 2]) * anchors[a][0]
        h = np.exp(r[gy, gx, a, 3]) * anchors[a][1]
        np.testing.assert_allclose(
            ours[gy, gx, a],
            [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], rtol=1e-5)

    # scale_x_y=2 darknet xy == u5 xy (the new_coords=1 equivalence)
    d2, _ = decode_yolo_darknet(jnp.asarray(raw), anchors, nc, stride=8,
                                scale_x_y=2.0)
    u5, _ = decode_yolo_u5(jnp.asarray(raw), anchors, nc, stride=8)
    d2c = (np.asarray(d2)[..., :2] + np.asarray(d2)[..., 2:]) / 2
    u5c = (np.asarray(u5)[..., :2] + np.asarray(u5)[..., 2:]) / 2
    np.testing.assert_allclose(d2c, u5c, rtol=1e-5)


def test_yolov4_backbone_end_to_end(rng):
    sections = tuple(tuple(sorted(s.items())) for s in parse_darknet_cfg(MINI_CFG))
    bb = YOLOv4Backbone(sections, conf_thresh=0.2, max_detections=5, pre_nms=64)
    images = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)).astype(np.float32))
    pad_mask = jnp.zeros((2, 64, 64), bool)
    params = bb.init(jax.random.PRNGKey(0), images, pad_mask)
    features, masks, dets = bb.apply(params, images, pad_mask)
    assert len(features) == 2
    assert dets["boxes"].shape == (2, 5, 4)
    assert dets["labels"].shape == (2, 5)
    valid = np.asarray(dets["valid"])
    labels = np.asarray(dets["labels"])
    assert np.all(labels[valid] >= 1)  # category ids, 0 is background


@pytest.mark.skipif(
    not os.path.exists("/root/reference/configs/ycbv_yolov4-csp.cfg"),
    reason="reference cfg not mounted",
)
def test_parse_full_reference_cfg():
    """The full 176-section YCB-V cfg must parse and type-check."""
    sections = load_cfg_sections("/root/reference/configs/ycbv_yolov4-csp.cfg")
    d = [dict(s) for s in sections]
    assert d[0]["type"] == "net"
    yolos = [s for s in d if s["type"] == "yolo"]
    assert len(yolos) == 3
    assert all(int(y["classes"]) == 21 for y in yolos)


def test_poet_with_yolov4_backbone(rng):
    """Full PoET on the yolov4 backbone (gt mode + backbone mode)."""
    import tempfile

    from tests.test_model import tiny_config, make_batch
    from poet_tpu.models import build_model

    with tempfile.NamedTemporaryFile("w", suffix=".cfg", delete=False) as f:
        f.write(MINI_CFG)
        cfg_path = f.name

    for mode in ("gt", "backbone"):
        cfg = tiny_config(bbox_mode=mode, num_feature_levels=3)
        cfg.backbone.name = "yolov4"
        cfg.backbone.cfg_path = cfg_path
        cfg.backbone.conf_thresh = 0.2
        cfg.backbone.max_detections = 8
        from poet_tpu.models import build_model as bm

        model = bm(cfg)
        images, pad_mask, targets = make_batch(rng, B=2, H=64, W=64)
        params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)
        out = model.apply(params, images, pad_mask, targets)
        assert out["translations"].shape == (2, 2, 5, 3)
        assert np.isfinite(np.asarray(out["translations"])).all()


def test_encoder_min_stride_drops_fine_maps(rng):
    """encoder_min_stride trims transformer inputs but leaves detections
    untouched (TPU-first extension; BackboneConfig.encoder_min_stride)."""
    sections = tuple(tuple(sorted(s.items())) for s in parse_darknet_cfg(MINI_CFG))
    images = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)).astype(np.float32))
    pad_mask = jnp.zeros((2, 64, 64), bool)

    bb_all = YOLOv4Backbone(sections, conf_thresh=0.2, max_detections=5, pre_nms=64)
    params = bb_all.init(jax.random.PRNGKey(0), images, pad_mask)
    f_all, m_all, d_all = bb_all.apply(params, images, pad_mask)
    strides = [64 // f.shape[1] for f in f_all]
    cut = max(strides)  # keep only the coarsest map

    bb_cut = YOLOv4Backbone(sections, conf_thresh=0.2, max_detections=5,
                            pre_nms=64, encoder_min_stride=cut)
    f_cut, m_cut, d_cut = bb_cut.apply(params, images, pad_mask)

    assert len(f_cut) == sum(1 for s in strides if s >= cut)
    assert len(f_cut) < len(f_all)
    assert len(m_cut) == len(f_cut)
    assert all(64 // f.shape[1] >= cut for f in f_cut)
    for k in d_all:
        np.testing.assert_array_equal(np.asarray(d_all[k]), np.asarray(d_cut[k]))


def test_poet_with_trimmed_encoder(rng):
    """Full PoET in backbone mode with encoder_min_stride trimming: the
    transformer sees fewer levels (extras built from the coarsest), the
    detection-driven query path still works."""
    import tempfile

    from tests.test_model import tiny_config, make_batch
    from poet_tpu.models import build_model

    with tempfile.NamedTemporaryFile("w", suffix=".cfg", delete=False) as f:
        f.write(MINI_CFG)
        cfg_path = f.name

    # find the coarsest stride of the mini cfg
    sections = tuple(tuple(sorted(s.items())) for s in parse_darknet_cfg(MINI_CFG))
    bb = YOLOv4Backbone(sections, conf_thresh=0.2, max_detections=5, pre_nms=64)
    images = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)).astype(np.float32))
    pad_mask = jnp.zeros((2, 64, 64), bool)
    p0 = bb.init(jax.random.PRNGKey(0), images, pad_mask)
    f_all, _, _ = bb.apply(p0, images, pad_mask)
    cut = max(64 // f.shape[1] for f in f_all)

    cfg = tiny_config(bbox_mode="backbone", num_feature_levels=3)
    cfg.backbone.name = "yolov4"
    cfg.backbone.cfg_path = cfg_path
    cfg.backbone.conf_thresh = 0.2
    cfg.backbone.max_detections = 8
    cfg.backbone.encoder_min_stride = cut     # keep only the coarsest map

    model = build_model(cfg)
    images2, pad_mask2, targets = make_batch(rng, B=2, H=64, W=64)
    params = model.init(jax.random.PRNGKey(0), images2, pad_mask2, targets)
    out = model.apply(params, images2, pad_mask2, targets)
    assert out["translations"].shape == (2, 2, 5, 3)
    assert np.isfinite(np.asarray(out["translations"])).all()


# ---------------------------------------------------------------------------
# Shipped cfg assets (generated by scripts/gen_yolov4_csp_cfg.py)
# ---------------------------------------------------------------------------

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_CFG = "/root/reference/configs/ycbv_yolov4-csp.cfg"


def _canonical_graph(path):
    """Reduce a darknet cfg to its semantic layer graph (absolute indices)."""
    secs = parse_darknet_cfg(open(path).read())
    out = []
    for i, s in enumerate(secs):
        t, li = s["type"], i - 1
        if t == "net":
            out.append(("net", s.get("width"), s.get("height"), s.get("channels")))
        elif t == "convolutional":
            out.append(("conv", int(s["filters"]), int(s["size"]),
                        int(s.get("stride", 1)), s.get("activation", "linear"),
                        int(s.get("batch_normalize", 0))))
        elif t == "route":
            idx = [int(x) for x in str(s["layers"]).split(",")]
            out.append(("route", tuple(j if j >= 0 else li + j for j in idx)))
        elif t == "shortcut":
            f = int(s["from"])
            out.append(("shortcut", f if f >= 0 else li + f))
        elif t == "maxpool":
            out.append(("maxpool", int(s["size"]), int(s.get("stride", s["size"]))))
        elif t == "upsample":
            out.append(("upsample", int(s.get("stride", 2))))
        elif t == "yolo":
            out.append(("yolo", s["mask"].replace(" ", ""),
                        s["anchors"].replace(" ", ""), int(s["classes"]),
                        float(s.get("scale_x_y", 1.0))))
    return out


def test_shipped_cfgs_parse_and_regenerate():
    """configs/*_yolov4-csp.cfg exist, parse, and match their generator."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_cfg", os.path.join(REPO_ROOT, "scripts", "gen_yolov4_csp_cfg.py"))
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    for name, classes in (("ycbv", 21), ("lmo", 8)):
        path = os.path.join(REPO_ROOT, "configs", f"{name}_yolov4-csp.cfg")
        assert os.path.exists(path), path
        secs = [dict(s) for s in load_cfg_sections(path)]
        yolos = [s for s in secs if s["type"] == "yolo"]
        assert len(yolos) == 3
        assert all(int(y["classes"]) == classes for y in yolos)
        assert open(path).read() == gen.build(classes, 640, 640)


@pytest.mark.skipif(not os.path.exists(REF_CFG), reason="reference cfg not mounted")
def test_shipped_ycbv_cfg_matches_reference_graph():
    """Generated YCB-V cfg is semantically identical to the reference's."""
    ours = _canonical_graph(os.path.join(REPO_ROOT, "configs", "ycbv_yolov4-csp.cfg"))
    ref = _canonical_graph(REF_CFG)
    assert len(ours) == len(ref)
    for i, (a, b) in enumerate(zip(ref, ours)):
        assert a == b, (i, a, b)


def test_yolov4_default_cfg_fallback(rng):
    """--backbone yolov4 with no --backbone_cfg uses the shipped cfg."""
    from tests.test_model import tiny_config
    from poet_tpu.models import build_model

    cfg = tiny_config(bbox_mode="gt", num_feature_levels=3)
    cfg.backbone.name = "yolov4"
    cfg.backbone.cfg_path = ""
    cfg.data.dataset = "ycbv"
    model = build_model(cfg)
    secs = [dict(s) for s in model.backbone.cfg_sections]
    assert sum(1 for s in secs if s["type"] == "yolo") == 3


def test_s2d_stride2_conv_matches_plain(rng, monkeypatch):
    """The space-to-depth rewrite of 3x3/s2 convs (small-C layout fix) must
    be numerically equivalent to the plain conv graph on the SAME params —
    darknet .weights import and checkpoints are layout-unchanged."""
    sections = tuple(tuple(sorted(s.items())) for s in parse_darknet_cfg(MINI_CFG))
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))

    monkeypatch.setenv("POET_YOLO_S2D", "0")
    body = DarknetBody(sections)
    params = body.init(jax.random.PRNGKey(0), x)
    yolo_plain, _, feats_plain = body.apply(params, x)

    monkeypatch.setenv("POET_YOLO_S2D", "1")
    yolo_s2d, _, feats_s2d = DarknetBody(sections).apply(params, x)

    for a, b in zip(yolo_plain + feats_plain, yolo_s2d + feats_s2d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
