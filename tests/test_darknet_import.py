"""Darknet .weights importer round-trip tests (utils/darknet_import.py)."""

import struct

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from poet_tpu.models.yolov4 import YOLOv4Backbone, parse_darknet_cfg
from poet_tpu.utils.darknet_import import (
    _channel_walk,
    load_darknet_weights,
    load_yolov4_weights,
)

TINY_CFG = """
[net]
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
filters=8
size=3
stride=2
pad=1
activation=mish
[route]
layers=-1
groups=2
group_id=1
[convolutional]
batch_normalize=1
filters=4
size=1
stride=1
pad=1
activation=leaky
[shortcut]
from=-2
activation=linear
[route]
layers=-1,-3
[maxpool]
size=2
stride=2
[convolutional]
filters=27
size=1
stride=1
pad=1
activation=linear
[yolo]
mask=0,1,2
anchors=10,13, 16,30, 33,23, 30,61, 62,45, 59,119, 116,90, 156,198, 373,326
classes=4
num=9
"""


def _write_darknet(path, sections, param_tree):
    """Serialize a DarknetBody param subtree to the darknet binary format."""
    with open(path, "wb") as f:
        f.write(struct.pack("<3i", 0, 2, 5))
        f.write(struct.pack("<q", 0))
        for li, sec, c_in in _channel_walk(sections):
            bn = int(sec.get("batch_normalize", 0))
            conv = param_tree[f"conv_{li}"]
            if bn:
                b = param_tree[f"bn_{li}"]
                for k in ("bias", "weight", "running_mean", "running_var"):
                    f.write(np.asarray(b[k], np.float32).tobytes())
            else:
                f.write(np.asarray(conv["bias"], np.float32).tobytes())
            kern = np.asarray(conv["kernel"], np.float32)  # (kh, kw, in, out)
            f.write(kern.transpose(3, 2, 0, 1).tobytes())


@pytest.fixture(scope="module")
def tiny_model():
    sections = parse_darknet_cfg(TINY_CFG)
    cfg_sections = tuple(tuple(sorted(s.items())) for s in sections)
    model = YOLOv4Backbone(cfg_sections=cfg_sections, conf_thresh=0.01,
                           max_detections=5, pre_nms=32)
    images = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 64, 64, 3)),
                         jnp.float32)
    pad_mask = jnp.zeros((1, 64, 64), bool)
    params = model.init(jax.random.PRNGKey(0), images, pad_mask)
    return sections, cfg_sections, model, images, pad_mask, params


def test_roundtrip_exact(tmp_path, tiny_model):
    sections, cfg_sections, model, images, pad_mask, params = tiny_model
    body = params["params"]["body"]
    path = str(tmp_path / "w.weights")
    _write_darknet(path, sections, body)

    loaded = load_darknet_weights(cfg_sections, path)
    for mod, leaves in loaded.items():
        for k, v in leaves.items():
            np.testing.assert_array_equal(v, np.asarray(body[mod][k]), err_msg=f"{mod}/{k}")


def test_merge_into_model_params(tmp_path, tiny_model):
    sections, cfg_sections, model, images, pad_mask, params = tiny_model
    path = str(tmp_path / "w.weights")
    _write_darknet(path, sections, params["params"]["body"])

    # zero the model params, merge weights back, forward must match original
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, params)
    merged, missing, unexpected = load_yolov4_weights(zeroed, cfg_sections, path)
    assert unexpected == []
    out_ref = model.apply(params, images, pad_mask)
    out_new = model.apply(merged, images, pad_mask)
    np.testing.assert_allclose(
        np.asarray(out_new[0][0]), np.asarray(out_ref[0][0]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_new[2]["boxes"]), np.asarray(out_ref[2]["boxes"]), atol=1e-5)


def test_mismatched_cfg_rejected(tmp_path, tiny_model):
    sections, cfg_sections, model, images, pad_mask, params = tiny_model
    path = str(tmp_path / "w.weights")
    _write_darknet(path, sections, params["params"]["body"])
    # truncate: must raise, not silently mis-assign
    data = open(path, "rb").read()
    open(path, "wb").write(data[:-64])
    with pytest.raises(ValueError):
        load_darknet_weights(cfg_sections, path)
