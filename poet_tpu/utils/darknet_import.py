"""Darknet .weights importer for the YOLOv4-CSP backbone.

The reference consumes Scaled-YOLOv4 via an external wrapper that loads
darknet-format weights (aau-cns/yolov4; selected with --backbone yolov4,
/root/reference/main.py:53, cfg at configs/ycbv_yolov4-csp.cfg). This module
reads the darknet binary format directly into the flax param tree of
`poet_tpu.models.yolov4.DarknetBody` — no torch needed.

Binary layout (AlexeyAB darknet, src/parser.c:save_weights_upto /
load_weights_upto):
  int32 major, int32 minor, int32 revision,
  seen: int64 if major*10+minor >= 2 else int32,
  then for every [convolutional] section in cfg order:
    if batch_normalize: biases(f), scales(f), rolling_mean(f), rolling_var(f)
    else:               biases(f)
    conv weights (f, c_in, k, k) row-major float32.

Darknet conv weights (out, in, kh, kw) map to flax NHWC kernels
(kh, kw, in, out) by transposing (2, 3, 1, 0).
"""

from __future__ import annotations

import struct
from typing import Any, Dict, List, Tuple

import numpy as np


def _channel_walk(sections: List[Dict[str, Any]]) -> List[Tuple[int, Dict[str, Any], int]]:
    """Yield (layer_index, section, in_channels) for every convolutional
    section, tracking channels through the darknet graph exactly as
    models/yolov4.py:DarknetBody executes it."""
    from poet_tpu.models.yolov4 import _ints

    assert sections[0]["type"] == "net"
    channels: List[int] = []
    c = int(sections[0].get("channels", 3))
    convs = []
    li = 0
    for sec in sections[1:]:
        t = sec["type"]
        if t == "convolutional":
            convs.append((li, sec, c))
            c = int(sec["filters"])
        elif t == "route":
            layers = _ints(sec["layers"])
            srcs = [channels[i if i >= 0 else li + i] for i in layers]
            groups = int(sec.get("groups", 1))
            c = sum(s // groups for s in srcs)
        elif t == "shortcut":
            pass                      # channels unchanged
        elif t in ("maxpool", "upsample"):
            pass
        elif t == "yolo":
            c = channels[-1]          # DarknetBody: x = outputs[-1]
        else:
            raise NotImplementedError(f"darknet section {t}")
        channels.append(c)
        li += 1
    return convs


def load_darknet_weights(cfg_sections, weights_path: str) -> Dict[str, Any]:
    """Read a darknet .weights file into a DarknetBody param subtree.

    cfg_sections: the hashable structure from models.yolov4.load_cfg_sections
    (or a plain list of dicts from parse_darknet_cfg).

    Returns {'conv_<i>': {'kernel', ['bias']}, 'bn_<i>': {...}} matching
    DarknetBody's module names. Raises if the file size does not exactly
    match the cfg (wrong cfg/weights pairing).
    """
    sections = [dict(s) for s in cfg_sections]
    with open(weights_path, "rb") as f:
        major, minor, revision = struct.unpack("<3i", f.read(12))
        if major * 10 + minor >= 2:
            (seen,) = struct.unpack("<q", f.read(8))
        else:
            (seen,) = struct.unpack("<i", f.read(4))
        buf = np.frombuffer(f.read(), dtype=np.float32)

    tree: Dict[str, Any] = {}
    pos = 0

    def take(n):
        nonlocal pos
        if pos + n > buf.size:
            raise ValueError(
                f"darknet weights exhausted at float {pos} + {n} > {buf.size}: "
                "cfg does not match this .weights file"
            )
        out = buf[pos : pos + n]
        pos += n
        return out

    for li, sec, c_in in _channel_walk(sections):
        filters = int(sec["filters"])
        size = int(sec["size"])
        bn = int(sec.get("batch_normalize", 0))
        groups = int(sec.get("groups", 1))
        assert groups == 1, "grouped conv not used by yolov4-csp"
        if bn:
            beta = take(filters).copy()
            gamma = take(filters).copy()
            mean = take(filters).copy()
            var = take(filters).copy()
            tree[f"bn_{li}"] = {
                "bias": beta, "weight": gamma,
                "running_mean": mean, "running_var": var,
            }
        else:
            bias = take(filters).copy()
        w = take(filters * c_in * size * size).reshape(filters, c_in, size, size)
        entry: Dict[str, Any] = {"kernel": w.transpose(2, 3, 1, 0).copy()}
        if not bn:
            entry["bias"] = bias
        tree[f"conv_{li}"] = entry

    if pos != buf.size:
        raise ValueError(
            f"darknet weights file has {buf.size - pos} unread floats: "
            "cfg does not match this .weights file"
        )
    return tree


def load_yolov4_weights(params: Dict[str, Any], cfg_sections, weights_path: str):
    """Merge darknet weights into a built model's param tree.

    Finds the DarknetBody subtree (module name 'body') anywhere under
    params['params'] and merges strict=False with a missing/unexpected
    report, mirroring the reference's detector checkpoint load behavior
    (/root/reference/models/backbone_maskrcnn.py:138-149).
    """
    from poet_tpu.engine.checkpoint import merge_params

    loaded = load_darknet_weights(cfg_sections, weights_path)

    def locate(tree, path=()):
        if isinstance(tree, dict):
            for k, v in tree.items():
                if k == "body" and isinstance(v, dict) and any(
                    kk.startswith("conv_") for kk in v
                ):
                    return path + (k,)
                found = locate(v, path + (k,))
                if found:
                    return found
        return None

    body_path = locate(params)
    if body_path is None:
        raise ValueError("no DarknetBody ('body') subtree found in params")
    wrapped: Dict[str, Any] = loaded
    for k in reversed(body_path):
        wrapped = {k: wrapped}
    merged, missing, unexpected = merge_params(params, wrapped)
    return merged, missing, unexpected
