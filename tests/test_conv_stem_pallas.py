"""conv_stem_pallas (interpret mode) vs lax.conv_general_dilated.

The kernel replaces XLA's small-C stem conv lowering (ResNet-50 7x7/2 stem,
YOLOv4-CSP entry convs); these tests pin its arithmetic to the XLA conv it
replaces, per config the model actually uses, plus edge shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poet_tpu.models.yolov4 import mish
from poet_tpu.ops.conv_stem_pallas import conv_stem_pallas


def _ref(x, w, bias, stride, padding, activation):
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    if activation == "relu":
        out = jnp.maximum(out, 0.0)
    elif activation == "mish":
        out = mish(out)
    return out


CONFIGS = [
    # (kh, kw, C, F, stride, padding, activation) — model configs first:
    (7, 7, 3, 64, 2, ((3, 3), (3, 3)), "relu"),    # ResNet-50 stem
    (3, 3, 3, 32, 1, ((1, 1), (1, 1)), "mish"),    # YOLOv4-CSP layer 0
    (3, 3, 32, 64, 2, ((1, 1), (1, 1)), "mish"),   # YOLOv4-CSP layer 1
    (5, 3, 4, 16, 2, ((2, 1), (1, 2)), None),      # asymmetric everything
    (1, 1, 8, 24, 1, ((0, 0), (0, 0)), "relu"),    # degenerate 1x1
]


@pytest.mark.parametrize("kh,kw,C,F,stride,padding,act", CONFIGS)
def test_matches_xla_conv(kh, kw, C, F, stride, padding, act):
    rng = np.random.default_rng(hash((kh, kw, C, F, stride)) % 2**31)
    B, H, W = 2, 38, 52                      # non-multiples of tile sizes
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((kh, kw, C, F)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((F,)), jnp.float32)
    out = conv_stem_pallas(x, w, b, stride=stride, padding=padding,
                           activation=act, interpret=True)
    ref = _ref(x, w, b, stride, padding, act)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_bf16_and_no_bias():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 33, 47, 3)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.1, jnp.bfloat16)
    out = conv_stem_pallas(x, w, None, stride=2, padding=((3, 3), (3, 3)),
                           activation="relu", interpret=True)
    ref = _ref(x, w, None, 2, ((3, 3), (3, 3)), "relu")
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=0.15, rtol=0.1)


def test_full_stem_shape():
    """Flagship-shaped stem: 480x640 -> 240x320x64 (run tiny batch)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 480, 640, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.05, jnp.float32)
    out = conv_stem_pallas(x, w, None, stride=2, padding=((3, 3), (3, 3)),
                           activation="relu", interpret=True)
    ref = _ref(x, w, None, 2, ((3, 3), (3, 3)), "relu")
    assert out.shape == (1, 240, 320, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_resnet_stem_wiring():
    """ResNet50 with the Pallas stem (interpret) matches the XLA stem on
    identical params — the BN fold + param-holder tree must be exact."""
    from poet_tpu.models.resnet_fpn import ResNet50

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    xla = ResNet50(stem_impl="xla")
    params = xla.init(jax.random.PRNGKey(0), x)
    # make the frozen-BN fold non-trivial
    bn = params["params"]["bn1"]
    for k in bn:
        bn[k] = jnp.asarray(rng.uniform(0.5, 1.5, bn[k].shape), jnp.float32)
    ref = xla.apply(params, x)
    pal = ResNet50(stem_impl="pallas_interpret")
    # identical param trees: the holder declares the same conv1/kernel
    params2 = pal.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params2) == jax.tree_util.tree_structure(params)
    out = pal.apply(params, x)
    for a, b in zip(ref, out):
        # BN-fold order changes f32 rounding; drift compounds through the
        # bottleneck stages (outputs are O(100))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-2, rtol=2e-3)


def test_darknet_stem_wiring(monkeypatch):
    """DarknetBody with the forced Pallas stem path (interpret) matches the
    default XLA convs on identical params — BN fold + _ConvParams tree."""
    from poet_tpu.models.yolov4 import DarknetBody, parse_darknet_cfg

    cfg = """
    [net]
    width=48
    height=48
    channels=3

    [convolutional]
    batch_normalize=1
    filters=8
    size=3
    stride=1
    pad=1
    activation=mish

    [convolutional]
    batch_normalize=1
    filters=16
    size=3
    stride=2
    pad=1
    activation=leaky

    [convolutional]
    filters=8
    size=1
    stride=1
    pad=1
    activation=linear

    [convolutional]
    filters=21
    size=1
    stride=1
    pad=1
    activation=logistic

    [yolo]
    anchors = 10,13, 16,30, 33,23
    mask = 0,1,2
    classes=2
    """
    sections = tuple(tuple(sorted(s.items())) for s in parse_darknet_cfg(cfg))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(size=(2, 48, 48, 3)), jnp.float32)

    monkeypatch.setenv("POET_YOLO_STEM", "0")
    body = DarknetBody(sections)
    params = body.init(jax.random.PRNGKey(0), x)
    for bn in ("bn_0", "bn_1"):
        for k in params["params"][bn]:
            params["params"][bn][k] = jnp.asarray(
                rng.uniform(0.5, 1.5, params["params"][bn][k].shape),
                jnp.float32)
    ref_inputs, _, ref_feats = body.apply(params, x)
    assert len(ref_inputs) == 1 and len(ref_feats) == 1

    monkeypatch.setenv("POET_YOLO_STEM", "interpret")
    params2 = body.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(params2)
            == jax.tree_util.tree_structure(params))
    out_inputs, _, out_feats = body.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_inputs[0]),
                               np.asarray(ref_inputs[0]),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(out_feats[0]),
                               np.asarray(ref_feats[0]),
                               atol=5e-4, rtol=5e-4)


def test_grad_raises():
    x = jnp.zeros((1, 16, 16, 3))
    w = jnp.zeros((3, 3, 3, 8))

    def f(w):
        return conv_stem_pallas(
            x, w, None, stride=1, padding=((1, 1), (1, 1)),
            interpret=True).sum()

    with pytest.raises(NotImplementedError):
        jax.grad(f)(w)
