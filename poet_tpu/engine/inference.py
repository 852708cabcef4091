"""Inference over a flat directory of images -> results.json.

Parity target: inference_tools/inference_engine.py:24-76 + dataset.py:23-59 —
numeric-sorted image files, batch size 1, backbone bbox mode forced
(main.py:407), output {img_id: {det_idx: {t, rot, box, class}}}.
"""

from __future__ import annotations

import json
import os
import re
import numpy as np

import jax
import jax.numpy as jnp

from poet_tpu.config import PoETConfig
from poet_tpu.data.dataset import load_image_rgb_f32


def _numeric_key(name: str):
    m = re.findall(r"\d+", name)
    return (int(m[0]) if m else 0, name)


def list_inference_images(path: str):
    """Numeric-sorted image files. Parity: inference_tools/dataset.py:23-40."""
    files = [f for f in os.listdir(path)
             if f.lower().rsplit(".", 1)[-1] in ("png", "jpg", "jpeg", "bmp")]
    return sorted(files, key=_numeric_key)


def inference(model, params, cfg: PoETConfig):
    """Run PoET on an unannotated image dir; write results.json.

    params may be None: the model is then initialized from the first image
    and the resume checkpoint merged strict=False (parity with the
    reference's strict=False load at inference_engine.py:35-37 — e.g. a
    gt-mode-trained checkpoint has no detector weights; those stay at init
    unless --backbone_weights provides them).
    """
    assert cfg.runtime.inference_path, "--inference_path required"
    assert cfg.model.bbox_mode == "backbone", (
        "inference uses detector-predicted boxes (reference forces "
        "bbox_mode='backbone', main.py:407)"
    )
    files = list_inference_images(cfg.runtime.inference_path)
    assert files, f"no images in {cfg.runtime.inference_path}"
    out_dir = cfg.runtime.inference_output or cfg.runtime.output_dir
    os.makedirs(out_dir, exist_ok=True)

    if params is None:
        from poet_tpu.engine.checkpoint import load_checkpoint, merge_params

        arr0 = load_image_rgb_f32(
            os.path.join(cfg.runtime.inference_path, files[0]))[None]
        params = jax.jit(model.init)(
            jax.random.PRNGKey(cfg.runtime.seed), jnp.asarray(arr0),
            jnp.zeros(arr0.shape[:3], bool), None,
        )
        if cfg.backbone.weights:
            from poet_tpu.utils.torch_import import load_backbone_weights

            params, bb_missing, _ = load_backbone_weights(
                params, cfg.backbone.weights, darknet_cfg=cfg.backbone.cfg_path)
            if bb_missing:
                print("Backbone missing keys:", bb_missing)
        if cfg.runtime.resume:
            payload, _ = load_checkpoint(cfg.runtime.resume)
            params, missing, unexpected = merge_params(params, payload["params"])
            if missing:
                print("Missing Keys:", missing)
            if unexpected:
                print("Unexpected Keys:", unexpected)

    if cfg.model.dtype == "bfloat16":
        from poet_tpu.utils.params import cast_params_for_inference

        params = cast_params_for_inference(params)
    fwd = jax.jit(lambda p, i, m: model.apply(p, i, m, None, deterministic=True))

    results = {}

    def consume(out, img_id, fname):
        n = int(np.asarray(out["n_boxes"])[0])
        img_results = {}
        trans = np.asarray(out["translations"])[-1, 0]
        rots = np.asarray(out["rotations"])[-1, 0]
        boxes = np.asarray(out["pred_boxes"])[0]
        classes = np.asarray(out["pred_classes"])[0]
        for d in range(n):
            img_results[d] = {
                "t": trans[d].tolist(),
                "rot": rots[d].tolist(),
                "box": boxes[d].tolist(),
                "class": int(classes[d]),
            }
        results[img_id] = img_results
        print(f"Processed {img_id + 1}/{len(files)}: {fname} ({n} objects)")

    # one-image-deep pipeline: decode + dispatch image k+1 before reading
    # image k's outputs, overlapping host decode and D2H with device compute
    # (same results as the reference's synchronous bs=1 loop,
    # inference_engine.py:46-75)
    pending = None
    for img_id, fname in enumerate(files):
        arr = load_image_rgb_f32(
            os.path.join(cfg.runtime.inference_path, fname))[None]
        pad_mask = jnp.zeros(arr.shape[:3], bool)
        out = fwd(params, jnp.asarray(arr), pad_mask)
        if pending is not None:
            consume(*pending)
        pending = (out, img_id, fname)
    if pending is not None:
        consume(*pending)

    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(results, f)
    return results
