"""Import reference (PyTorch) checkpoints into poet_tpu parameter trees.

The reference ships trained .pth checkpoints (model zoo, README.md:109-111)
whose state_dict keys follow models/pose_estimation_transformer.py +
models/deformable_transformer.py + torchvision naming. This module maps them
onto our flax trees so reference-trained weights run unchanged on TPU —
the basis for bit-level accuracy parity checks.

Conventions:
  * torch Linear weight (out, in)  -> flax Dense kernel (in, out): transpose,
  * torch Conv2d weight (O, I, kh, kw) -> flax Conv kernel (kh, kw, I, O),
  * torch nn.MultiheadAttention packed in_proj (3C, C) -> flax MHA
    query/key/value kernels (C, H, Dh) + out kernel (H, Dh, C),
  * BatchNorm/GroupNorm/LayerNorm weight/bias -> scale/bias (+ running stats
    for FrozenBatchNorm).

Input is a {name: numpy array} dict (load .pth via torch.load on CPU and
call `state_dict_to_numpy`).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            for k, v in state_dict.items()}


def _linear(sd, prefix):
    return {
        "kernel": sd[f"{prefix}.weight"].T,
        "bias": sd[f"{prefix}.bias"],
    }


def _conv(sd, prefix, bias=True):
    out = {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _norm(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _frozen_bn(sd, prefix):
    return {
        "weight": sd[f"{prefix}.weight"],
        "bias": sd[f"{prefix}.bias"],
        "running_mean": sd[f"{prefix}.running_mean"],
        "running_var": sd[f"{prefix}.running_var"],
    }


def _mha(sd, prefix, n_heads):
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention."""
    w = sd[f"{prefix}.in_proj_weight"]            # (3C, C)
    b = sd[f"{prefix}.in_proj_bias"]              # (3C,)
    C = w.shape[1]
    Dh = C // n_heads
    qw, kw, vw = np.split(w, 3, axis=0)
    qb, kb, vb = np.split(b, 3, axis=0)

    def proj(wi, bi):
        return {"kernel": wi.T.reshape(C, n_heads, Dh), "bias": bi.reshape(n_heads, Dh)}

    ow = sd[f"{prefix}.out_proj.weight"]          # (C, C)
    ob = sd[f"{prefix}.out_proj.bias"]
    return {
        "query": proj(qw, qb),
        "key": proj(kw, kb),
        "value": proj(vw, vb),
        "out": {"kernel": ow.T.reshape(n_heads, Dh, C), "bias": ob},
    }


def _mlp(sd, prefix, n_layers=3):
    """Reference MLP head (pose_estimation_transformer.py:677-689)."""
    return {
        f"layer_{i}": _linear(sd, f"{prefix}.layers.{i}") for i in range(n_layers)
    }


def convert_poet_checkpoint(
    sd: Dict[str, np.ndarray],
    enc_layers: int,
    dec_layers: int,
    nheads: int,
    aleatoric: bool = False,
) -> Dict[str, Any]:
    """Reference PoET state_dict -> our PoET 'params' subtree (transformer,
    input_proj, heads). Backbone weights load separately (the reference also
    loads them separately, backbone_maskrcnn.py:138-149)."""
    out: Dict[str, Any] = {}

    # transformer
    tr: Dict[str, Any] = {"level_embed": sd["transformer.level_embed"]}
    if "transformer.reference_points.weight" in sd:
        tr["reference_points"] = _linear(sd, "transformer.reference_points")
    for i in range(enc_layers):
        p = f"transformer.encoder.layers.{i}"
        tr[f"encoder_layer_{i}"] = {
            "self_attn": _msdeform(sd, f"{p}.self_attn"),
            "norm1": _norm(sd, f"{p}.norm1"),
            "norm2": _norm(sd, f"{p}.norm2"),
            "linear1": _linear(sd, f"{p}.linear1"),
            "linear2": _linear(sd, f"{p}.linear2"),
        }
    for i in range(dec_layers):
        p = f"transformer.decoder.layers.{i}"
        tr[f"decoder_layer_{i}"] = {
            "cross_attn": _msdeform(sd, f"{p}.cross_attn"),
            "self_attn": _mha(sd, f"{p}.self_attn", nheads),
            "norm1": _norm(sd, f"{p}.norm1"),
            "norm2": _norm(sd, f"{p}.norm2"),
            "norm3": _norm(sd, f"{p}.norm3"),
            "linear1": _linear(sd, f"{p}.linear1"),
            "linear2": _linear(sd, f"{p}.linear2"),
        }
    out["transformer"] = tr

    # input projections: Sequential(Conv2d, GroupNorm)
    n_proj = len({k.split(".")[1] for k in sd if k.startswith("input_proj.")})
    for lvl in range(n_proj):
        out[f"input_proj_{lvl}_conv"] = _conv(sd, f"input_proj.{lvl}.0")
        out[f"input_proj_{lvl}_gn"] = _norm(sd, f"input_proj.{lvl}.1")

    # per-layer heads (ModuleList of MLPs)
    for lvl in range(dec_layers):
        out[f"translation_head_{lvl}"] = _mlp(sd, f"translation_head.{lvl}")
        out[f"rotation_head_{lvl}"] = _mlp(sd, f"rotation_head.{lvl}")
        if aleatoric:
            out[f"translation_head_aleatoric_{lvl}"] = _mlp(
                sd, f"translation_head_aleatoric.{lvl}")
            out[f"rotation_head_aleatoric_{lvl}"] = _mlp(
                sd, f"rotation_head_aleatoric.{lvl}")

    if "query_embed.weight" in sd:
        out["query_embed"] = sd["query_embed.weight"]
    # learned position embedding lives inside the Joiner at backbone.1
    # (models/backbone.py:21-30; PositionEmbeddingLearned row/col tables,
    # position_encoding.py:87-99)
    if "backbone.1.row_embed.weight" in sd:
        out["position_embedding"] = {
            "row_embed": sd["backbone.1.row_embed.weight"],
            "col_embed": sd["backbone.1.col_embed.weight"],
        }
    return out


def _msdeform(sd, prefix):
    """External MSDeformAttn module params (4 Linear layers)."""
    return {
        "value_proj": _linear(sd, f"{prefix}.value_proj"),
        "sampling_offsets": _linear(sd, f"{prefix}.sampling_offsets"),
        "attention_weights": _linear(sd, f"{prefix}.attention_weights"),
        "output_proj": _linear(sd, f"{prefix}.output_proj"),
    }


# ---------------------------------------------------------------------------
# torchvision resnet50-fpn (Mask R-CNN backbone)
# ---------------------------------------------------------------------------

_BLOCKS = [3, 4, 6, 3]


def convert_resnet_fpn(sd: Dict[str, np.ndarray], prefix: str = "backbone.") -> Dict[str, Any]:
    """torchvision resnet_fpn_backbone state_dict -> our ResNetFPN params.

    `prefix` is where the backbone lives in the checkpoint (the reference's
    MaskRCNN uses 'backbone.' for the FPN body, backbone_maskrcnn.py:30).
    """
    body: Dict[str, Any] = {
        "conv1": _conv(sd, f"{prefix}body.conv1", bias=False),
        "bn1": _frozen_bn(sd, f"{prefix}body.bn1"),
    }
    for stage, n in enumerate(_BLOCKS):
        for b in range(n):
            p = f"{prefix}body.layer{stage + 1}.{b}"
            blk = {
                "conv1": _conv(sd, f"{p}.conv1", bias=False),
                "bn1": _frozen_bn(sd, f"{p}.bn1"),
                "conv2": _conv(sd, f"{p}.conv2", bias=False),
                "bn2": _frozen_bn(sd, f"{p}.bn2"),
                "conv3": _conv(sd, f"{p}.conv3", bias=False),
                "bn3": _frozen_bn(sd, f"{p}.bn3"),
            }
            if f"{p}.downsample.0.weight" in sd:
                blk["downsample_conv"] = _conv(sd, f"{p}.downsample.0", bias=False)
                blk["downsample_bn"] = _frozen_bn(sd, f"{p}.downsample.1")
            body[f"layer{stage + 1}_{b}"] = blk

    fpn: Dict[str, Any] = {}
    for i in range(4):
        # torchvision naming drifted: inner_blocks.{i}(.0)?.weight
        for cand in (f"{prefix}fpn.inner_blocks.{i}", f"{prefix}fpn.inner_blocks.{i}.0"):
            if f"{cand}.weight" in sd:
                fpn[f"inner_{i}"] = _conv(sd, cand)
                break
        for cand in (f"{prefix}fpn.layer_blocks.{i}", f"{prefix}fpn.layer_blocks.{i}.0"):
            if f"{cand}.weight" in sd:
                fpn[f"layer_{i}"] = _conv(sd, cand)
                break
    return {"body": body, "fpn": fpn}


def convert_maskrcnn_heads(
    sd: Dict[str, np.ndarray], prefix: str = ""
) -> Dict[str, Any]:
    """RPN + box RoI heads from a torchvision MaskRCNN state_dict."""
    rpn_conv = (f"{prefix}rpn.head.conv"
                if f"{prefix}rpn.head.conv.weight" in sd
                else f"{prefix}rpn.head.conv.0.0")
    return {
        "rpn_head": {
            "conv": _conv(sd, rpn_conv),
            "cls_logits": _conv(sd, f"{prefix}rpn.head.cls_logits"),
            "bbox_pred": _conv(sd, f"{prefix}rpn.head.bbox_pred"),
        },
        "box_head": {
            "fc6": _linear(sd, f"{prefix}roi_heads.box_head.fc6"),
            "fc7": _linear(sd, f"{prefix}roi_heads.box_head.fc7"),
        },
        "box_predictor": {
            "cls_score": _linear(sd, f"{prefix}roi_heads.box_predictor.cls_score"),
            "bbox_pred": _linear(sd, f"{prefix}roi_heads.box_predictor.bbox_pred"),
        },
    }


# ---------------------------------------------------------------------------
# end-to-end wiring: --backbone_weights, zoo-checkpoint conversion, CLI
# ---------------------------------------------------------------------------


def load_state_dict_file(path: str) -> Dict[str, np.ndarray]:
    """Load a checkpoint file into a flat {key: np.ndarray} state dict.

    Accepts torchvision/PoET `.pth`/`.pt` (requires torch importable — CPU
    load) and `.npz` (pre-exported, torch-free). Unwraps the reference's
    {"model": state_dict} payload (main.py:288-292) and DDP "module."
    prefixes.
    """
    if path.endswith(".npz"):
        sd = {k: np.asarray(v) for k, v in np.load(path).items()}
    else:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(obj, dict) and not hasattr(obj, "detach"):
            for key in ("model", "state_dict", "model_state_dict"):
                if key in obj and isinstance(obj[key], dict):
                    obj = obj[key]
                    break
        sd = state_dict_to_numpy(obj)
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def convert_backbone_checkpoint(
    sd: Dict[str, np.ndarray], detector: bool = True, prefix: str = ""
) -> Dict[str, Any]:
    """torchvision (Mask/Faster) R-CNN state_dict -> our backbone subtree
    ({fpn_body, detector?} as produced by MaskRCNN*Backbone modules)."""
    tree: Dict[str, Any] = {
        "fpn_body": convert_resnet_fpn(sd, prefix=f"{prefix}backbone.")
    }
    if detector and any(k.startswith(f"{prefix}rpn.") for k in sd):
        tree["detector"] = convert_maskrcnn_heads(sd, prefix=prefix)
    return tree


def load_backbone_weights(params: Dict[str, Any], path: str,
                          darknet_cfg: str = None):
    """Merge a `--backbone_weights` detector checkpoint into model params.

    Parity: the reference loads the detector checkpoint at build time
    (backbone_maskrcnn.py:138-149; strict for maskrcnn, strict=False for
    fasterrcnn). Here always strict=False with a missing/unexpected report —
    the caller decides whether to fail on it.
    Returns (params, missing, unexpected).

    A darknet `.weights` file (the Scaled-YOLOv4 distribution format) routes
    to utils.darknet_import; it needs the matching darknet cfg.
    """
    from poet_tpu.engine.checkpoint import merge_params

    if path.endswith(".weights"):
        from poet_tpu.models.yolov4 import load_cfg_sections
        from poet_tpu.utils.darknet_import import load_yolov4_weights

        assert darknet_cfg, "--backbone_cfg (darknet cfg) required for .weights"
        return load_yolov4_weights(params, load_cfg_sections(darknet_cfg), path)

    sd = load_state_dict_file(path)
    backbone = params["params"]["backbone"]
    tree = convert_backbone_checkpoint(sd, detector="detector" in backbone)
    merged, missing, unexpected = merge_params(backbone, tree)
    params = dict(params)
    params["params"] = dict(params["params"])
    params["params"]["backbone"] = merged
    return params, missing, unexpected


def assemble_poet_params(
    sd: Dict[str, np.ndarray],
    enc_layers: int,
    dec_layers: int,
    nheads: int,
    aleatoric: bool = False,
) -> Dict[str, Any]:
    """Full PoET zoo state_dict -> our complete 'params' subtree.

    Zoo checkpoints hold the detector inside the Joiner at 'backbone.0.*'
    (models/backbone.py:21-30: Sequential(detector, position_embedding)), the
    MaskRCNN's own FPN at 'backbone.0.backbone.*' and RPN/RoI heads at
    'backbone.0.{rpn,roi_heads}.*'.
    """
    tree = convert_poet_checkpoint(sd, enc_layers, dec_layers, nheads, aleatoric)
    if any(k.startswith("backbone.0.backbone.") for k in sd):
        tree["backbone"] = convert_backbone_checkpoint(sd, prefix="backbone.0.")
    return tree


def _converter_cli():
    """`python -m poet_tpu.utils.torch_import ckpt.pth out_dir [flags]` —
    convert a reference model-zoo checkpoint into an orbax directory that
    `--resume` can load directly."""
    import argparse

    p = argparse.ArgumentParser(
        "PoET checkpoint converter (torch -> orbax)",
        description=__doc__,
    )
    p.add_argument("checkpoint", help=".pth/.pt/.npz reference checkpoint")
    p.add_argument("output", help="orbax checkpoint directory to create")
    p.add_argument("--enc_layers", type=int, default=5)
    p.add_argument("--dec_layers", type=int, default=5)
    p.add_argument("--nheads", type=int, default=16)
    p.add_argument("--aleatoric", action="store_true")
    args = p.parse_args()

    import os

    import orbax.checkpoint as ocp

    sd = load_state_dict_file(args.checkpoint)
    tree = assemble_poet_params(
        sd, args.enc_layers, args.dec_layers, args.nheads, args.aleatoric
    )
    payload = {"params": {"params": tree}, "step": 0, "epoch": -1}
    ocp.PyTreeCheckpointer().save(os.path.abspath(args.output), payload, force=True)
    n = sum(np.asarray(x).size for x in _tree_leaves(tree))
    print(f"wrote {args.output}: {n} parameters "
          f"({'with' if 'backbone' in tree else 'WITHOUT'} backbone)")


def _tree_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _tree_leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    _converter_cli()
