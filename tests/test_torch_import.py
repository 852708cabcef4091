"""Checkpoint-import tests: mapping completeness + MHA numerical equivalence."""

import os
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from flax import linen as nn

from poet_tpu.engine.checkpoint import merge_params
from poet_tpu.utils.torch_import import (
    convert_poet_checkpoint,
    convert_resnet_fpn,
    _mha,
    state_dict_to_numpy,
)


def test_mha_conversion_matches_torch(rng):
    """torch nn.MultiheadAttention == flax MHA with converted params."""
    C, H, Q = 32, 4, 6
    torch.manual_seed(0)
    mha = torch.nn.MultiheadAttention(C, H, dropout=0.0)
    x = rng.normal(size=(Q, 1, C)).astype(np.float32)  # (L, N, C) torch layout
    q = torch.from_numpy(x)
    with torch.no_grad():
        ref, _ = mha(q, q, q)
    ref = ref.numpy()[:, 0, :]

    sd = state_dict_to_numpy(mha.state_dict())
    sd = {f"self_attn.{k}": v for k, v in sd.items()}
    params = {"params": _mha(sd, "self_attn", H)}

    fl = nn.MultiHeadDotProductAttention(
        num_heads=H, qkv_features=C, out_features=C, dropout_rate=0.0,
        deterministic=True,
    )
    xj = jnp.asarray(x[:, 0, :][None])  # (1, Q, C)
    out = np.asarray(fl.apply(params, inputs_q=xj, inputs_k=xj, inputs_v=xj))[0]
    np.testing.assert_allclose(out, ref, atol=2e-5)


def _fake_poet_state_dict(C=64, heads=4, enc=2, dec=2, n_proj=4, n_out=3,
                          ffn=128, n_levels=4, n_points=4):
    """Synthesize a reference-shaped PoET state_dict with random values."""
    g = np.random.default_rng(0)
    sd = {}

    def lin(name, i, o):
        sd[f"{name}.weight"] = g.normal(size=(o, i)).astype(np.float32)
        sd[f"{name}.bias"] = g.normal(size=(o,)).astype(np.float32)

    def norm(name, c=C):
        sd[f"{name}.weight"] = g.normal(size=(c,)).astype(np.float32)
        sd[f"{name}.bias"] = g.normal(size=(c,)).astype(np.float32)

    sd["transformer.level_embed"] = g.normal(size=(n_levels, C)).astype(np.float32)
    lin("transformer.reference_points", C, 2)
    for i in range(enc):
        p = f"transformer.encoder.layers.{i}"
        for sub, o in [("value_proj", C), ("output_proj", C),
                       ("sampling_offsets", heads * n_levels * n_points * 2),
                       ("attention_weights", heads * n_levels * n_points)]:
            lin(f"{p}.self_attn.{sub}", C, o)
        norm(f"{p}.norm1"); norm(f"{p}.norm2")
        lin(f"{p}.linear1", C, ffn); lin(f"{p}.linear2", ffn, C)
    for i in range(dec):
        p = f"transformer.decoder.layers.{i}"
        for sub, o in [("value_proj", C), ("output_proj", C),
                       ("sampling_offsets", heads * n_levels * n_points * 2),
                       ("attention_weights", heads * n_levels * n_points)]:
            lin(f"{p}.cross_attn.{sub}", C, o)
        sd[f"{p}.self_attn.in_proj_weight"] = g.normal(size=(3 * C, C)).astype(np.float32)
        sd[f"{p}.self_attn.in_proj_bias"] = g.normal(size=(3 * C,)).astype(np.float32)
        lin(f"{p}.self_attn.out_proj", C, C)
        norm(f"{p}.norm1"); norm(f"{p}.norm2"); norm(f"{p}.norm3")
        lin(f"{p}.linear1", C, ffn); lin(f"{p}.linear2", ffn, C)
    for lvl in range(n_proj):
        # extra pyramid levels (lvl >= 3 here) are 3x3 stride-2 convs
        # (pose_estimation_transformer.py:116-121)
        k = 1 if lvl < 3 else 3
        sd[f"input_proj.{lvl}.0.weight"] = g.normal(size=(C, 256, k, k)).astype(np.float32)
        sd[f"input_proj.{lvl}.0.bias"] = g.normal(size=(C,)).astype(np.float32)
        norm(f"input_proj.{lvl}.1")
    for lvl in range(dec):
        for head, o in (("translation_head", 3 * n_out), ("rotation_head", 6 * n_out)):
            lin(f"{head}.{lvl}.layers.0", C, C)
            lin(f"{head}.{lvl}.layers.1", C, C)
            lin(f"{head}.{lvl}.layers.2", C, o)
    return sd


def test_poet_conversion_structure():
    sd = _fake_poet_state_dict()
    out = convert_poet_checkpoint(sd, enc_layers=2, dec_layers=2, nheads=4)
    assert "encoder_layer_0" in out["transformer"]
    assert out["transformer"]["decoder_layer_1"]["self_attn"]["query"]["kernel"].shape == (64, 4, 16)
    assert out["input_proj_0_conv"]["kernel"].shape == (1, 1, 256, 64)
    assert out["translation_head_1"]["layer_2"]["bias"].shape == (9,)
    # kernel transpose applied
    np.testing.assert_allclose(
        out["transformer"]["encoder_layer_0"]["linear1"]["kernel"],
        sd["transformer.encoder.layers.0.linear1.weight"].T,
    )


def test_poet_conversion_merges_into_model(rng):
    """Converted tree must slot into our PoET params (transformer subtree)."""
    from tests.test_model import tiny_config, make_batch
    from poet_tpu.models import build_model

    cfg = tiny_config(class_mode="agnostic")  # head dims 3/6 = fake sd with n_out=1
    model = build_model(cfg)
    images, pad_mask, targets = make_batch(rng, B=2, H=64, W=64)
    params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)

    sd = _fake_poet_state_dict(C=64, heads=4, enc=2, dec=2, n_out=1)
    converted = convert_poet_checkpoint(sd, enc_layers=2, dec_layers=2, nheads=4)
    target_sub = {k: v for k, v in params["params"].items() if k != "backbone"}
    merged, missing, unexpected = merge_params(target_sub, converted)
    # the reference has no 'reference_points' Dense when ref mode is bbox; we
    # converted one — it shows up as unexpected. Everything else must match.
    assert not [m for m in missing if "reference_points" not in m], missing
    assert not [u for u in unexpected if "reference_points" not in u], unexpected


def _fake_rcnn_state_dict(prefix="", detector=False, num_classes=5):
    """Synthesize a torchvision (Mask R-CNN-shaped) detector state_dict."""
    g = np.random.default_rng(0)
    sd = {}

    def conv(name, o, i, k, bias=False):
        sd[f"{name}.weight"] = g.normal(size=(o, i, k, k)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = g.normal(size=(o,)).astype(np.float32)

    def lin(name, i, o):
        sd[f"{name}.weight"] = g.normal(size=(o, i)).astype(np.float32)
        sd[f"{name}.bias"] = g.normal(size=(o,)).astype(np.float32)

    def bn(name, c):
        for stat in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{name}.{stat}"] = g.normal(size=(c,)).astype(np.float32)

    conv(f"{prefix}backbone.body.conv1", 64, 3, 7)
    bn(f"{prefix}backbone.body.bn1", 64)
    widths = [64, 128, 256, 512]
    ins = [64, 256, 512, 1024]
    for stage, n in enumerate([3, 4, 6, 3]):
        for b in range(n):
            p = f"{prefix}backbone.body.layer{stage + 1}.{b}"
            w = widths[stage]
            cin = ins[stage] if b == 0 else w * 4
            conv(f"{p}.conv1", w, cin, 1); bn(f"{p}.bn1", w)
            conv(f"{p}.conv2", w, w, 3); bn(f"{p}.bn2", w)
            conv(f"{p}.conv3", w * 4, w, 1); bn(f"{p}.bn3", w * 4)
            if b == 0:
                conv(f"{p}.downsample.0", w * 4, cin, 1)
                bn(f"{p}.downsample.1", w * 4)
    for i, cin in enumerate([256, 512, 1024, 2048]):
        conv(f"{prefix}backbone.fpn.inner_blocks.{i}", 256, cin, 1, bias=True)
        conv(f"{prefix}backbone.fpn.layer_blocks.{i}", 256, 256, 3, bias=True)
    if detector:
        conv(f"{prefix}rpn.head.conv", 256, 256, 3, bias=True)
        conv(f"{prefix}rpn.head.cls_logits", 3, 256, 1, bias=True)
        conv(f"{prefix}rpn.head.bbox_pred", 12, 256, 1, bias=True)
        lin(f"{prefix}roi_heads.box_head.fc6", 256 * 49, 1024)
        lin(f"{prefix}roi_heads.box_head.fc7", 1024, 1024)
        lin(f"{prefix}roi_heads.box_predictor.cls_score", 1024, num_classes)
        lin(f"{prefix}roi_heads.box_predictor.bbox_pred", 1024, num_classes * 4)
    return sd


def test_resnet_conversion_structure():
    sd = _fake_rcnn_state_dict()

    out = convert_resnet_fpn(sd)
    assert out["body"]["conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert out["body"]["layer3_0"]["downsample_conv"]["kernel"].shape == (1, 1, 512, 1024)
    assert out["fpn"]["inner_3"]["kernel"].shape == (1, 1, 2048, 256)

    # merges into our ResNetFPN param structure
    from poet_tpu.models.resnet_fpn import ResNetFPN

    model = ResNetFPN()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    merged, missing, unexpected = merge_params(params["params"], out)
    assert missing == [], missing[:5]
    assert unexpected == [], unexpected[:5]


def test_load_backbone_weights_end_to_end(rng, tmp_path):
    """--backbone_weights wiring: a torchvision-format .pth merges into the
    detector-mode model with zero missing keys and the values are applied."""
    from tests.test_model import tiny_config, make_batch
    from poet_tpu.models import build_model
    from poet_tpu.utils.torch_import import load_backbone_weights

    cfg = tiny_config(bbox_mode="backbone")
    cfg.backbone.max_detections = 8
    model = build_model(cfg)
    images, pad_mask, targets = make_batch(rng, B=1, H=64, W=64)
    params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)

    n_det = cfg.model.n_classes + 1
    sd = _fake_rcnn_state_dict(detector=True, num_classes=n_det)
    ckpt = tmp_path / "detector.pth"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}}, ckpt)

    merged, missing, unexpected = load_backbone_weights(params, str(ckpt))
    assert missing == [], missing[:5]
    assert unexpected == [], unexpected[:5]
    np.testing.assert_allclose(
        merged["params"]["backbone"]["fpn_body"]["body"]["conv1"]["kernel"],
        sd["backbone.body.conv1.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        merged["params"]["backbone"]["detector"]["box_predictor"]["cls_score"]["kernel"],
        sd["roi_heads.box_predictor.cls_score.weight"].T,
    )


def test_zoo_checkpoint_converter_roundtrip(rng, tmp_path):
    """Zoo .pth -> orbax dir -> --resume load: one conversion command gives a
    checkpoint the CLI consumes (VERDICT r1 item 3)."""
    from tests.test_model import tiny_config, make_batch
    from poet_tpu.engine.checkpoint import load_checkpoint, merge_params
    from poet_tpu.models import build_model
    from poet_tpu.utils.torch_import import assemble_poet_params, load_state_dict_file

    # zoo-shaped checkpoint: PoET tree + detector inside the Joiner at backbone.0.*
    n_det = 5  # tiny_config n_classes + 1
    sd = _fake_poet_state_dict(C=64, heads=4, enc=2, dec=2, n_out=n_det)
    sd.update(_fake_rcnn_state_dict(prefix="backbone.0.", detector=True,
                                    num_classes=n_det))
    ckpt = tmp_path / "poet_zoo.pth"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()},
                "epoch": 49}, ckpt)

    # conversion (what `python -m poet_tpu.utils.torch_import` does)
    import orbax.checkpoint as ocp

    tree = assemble_poet_params(load_state_dict_file(str(ckpt)),
                                enc_layers=2, dec_layers=2, nheads=4)
    out_dir = tmp_path / "converted"
    ocp.PyTreeCheckpointer().save(
        str(out_dir), {"params": {"params": tree}, "step": 0, "epoch": -1},
        force=True)

    # --resume consumption path (cli.py)
    cfg = tiny_config(bbox_mode="backbone")
    cfg.backbone.max_detections = 8
    model = build_model(cfg)
    images, pad_mask, targets = make_batch(rng, B=1, H=64, W=64)
    params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)
    payload, _ = load_checkpoint(str(out_dir))
    merged, missing, unexpected = merge_params(params, payload["params"])
    # the fake sd has a reference_points Dense our bbox-mode model lacks
    assert not [m for m in missing if "reference_points" not in m], missing[:8]
    assert not [u for u in unexpected if "reference_points" not in u], unexpected[:8]
    np.testing.assert_allclose(
        merged["params"]["transformer"]["level_embed"], sd["transformer.level_embed"])
    np.testing.assert_allclose(
        merged["params"]["backbone"]["fpn_body"]["body"]["conv1"]["kernel"],
        sd["backbone.0.backbone.body.conv1.weight"].transpose(2, 3, 1, 0))


def test_resume_from_url_and_pth(tmp_path):
    """--resume accepts a URL or a raw zoo .pth/.npz directly (parity:
    main.py:288-290 https checkpoints; file:// keeps the test offline)."""
    from poet_tpu.engine.checkpoint import fetch_checkpoint, load_resume

    sd = _fake_poet_state_dict(C=64, heads=4, enc=2, dec=2, n_out=3)
    npz = tmp_path / "poet_zoo.npz"
    np.savez(npz, **sd)

    # URL fetch lands in the cache, bytes intact
    url = "file://" + str(npz)
    local = fetch_checkpoint(url)
    assert os.path.isfile(local) and local != str(npz)
    assert open(local, "rb").read() == open(npz, "rb").read()
    # cached: second fetch returns the same path without re-download
    assert fetch_checkpoint(url) == local

    # direct zoo-file resume: params-only payload, epoch 0
    for src in (str(npz), url):
        payload, start_epoch = load_resume(src, enc_layers=2, dec_layers=2,
                                           nheads=4)
        assert start_epoch == 0
        assert "opt_state" not in payload
        tree = payload["params"]["params"]
        assert "transformer" in tree and "translation_head_0" in tree

    # a raw .pth file routes through torch the same way
    pth = tmp_path / "poet_zoo.pth"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}}, pth)
    payload, start_epoch = load_resume(str(pth), enc_layers=2, dec_layers=2,
                                       nheads=4)
    assert start_epoch == 0 and "transformer" in payload["params"]["params"]

    # non-URL, non-file paths pass through untouched
    assert fetch_checkpoint("/some/orbax/dir") == "/some/orbax/dir"
