"""FULL-MODEL forward parity against the reference PoET (torch CPU).

Builds the reference's real PoET + DeformableTransformer + positional
encodings (models/pose_estimation_transformer.py, models/
deformable_transformer.py, models/position_encoding.py) around a pure-torch
MSDeformAttn (the external CUDA dep replaced by its published grid_sample
semantics — the same oracle tests/test_deform_attn.py uses), feeds BOTH
models identical multi-scale features via injected feature backbones,
converts the torch weights with utils/torch_import.convert_poet_checkpoint,
and asserts the stacked per-layer translations/rotations agree.

This closes the loop the per-module parity tests leave open: query
construction, level embeddings, valid ratios, encoder reference grids,
decoder wiring, per-layer heads and rotation post-processing are all
exercised together, weight-for-weight.
"""

import importlib.util
import math
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)

# geometry of the parity models: a fast tiny config plus the exact paper
# transformer dimensions (main.py:86-101 defaults — hidden 256, 16 heads,
# 5 enc / 5 dec, FFN 1024) over small feature maps so the torch-CPU side
# stays tractable. The paper-dims case exercises the real 16-way head
# packing and 5-layer error accumulation end-to-end.
DIM_CONFIGS = {
    "tiny": dict(HID=64, HEADS=4, ENC=2, DEC=2, FFN=128),
    "paper_dims": dict(HID=256, HEADS=16, ENC=5, DEC=5, FFN=1024),
}
HID, HEADS, ENC, DEC, FFN = 64, 4, 2, 2, 128   # rebound per-fixture-param
Q, NCLS, LEVELS = 5, 4, 4
FEAT_SHAPES = ((8, 10), (4, 5), (2, 3))     # backbone levels (strides 16/32/64)
IMG_H, IMG_W = 128, 160
B = 2

_FAKE_FEATS = []                            # NHWC numpy, set by the fixture


class _JaxFakeBackbone:
    """Feature-injection backbone for our PoET: returns fixed feature maps.

    A plain callable (not an nn.Module): PoET only calls
    `self.backbone(images, pad_mask)`, and keeping it stateless avoids
    embedding unhashable arrays as module attributes.
    """

    def __call__(self, images, pad_mask):
        feats = [jnp.asarray(f) for f in _FAKE_FEATS]
        masks = [jnp.zeros((f.shape[0],) + f.shape[1:3], bool) for f in feats]
        return feats, masks, None


def _load_reference_poet():
    """Import the reference PoET with its real transformer/position encodings
    and a pure-torch MSDeformAttn standing in for the external CUDA op."""
    import torch
    import torch.nn.functional as F
    from torch import nn

    if REF not in sys.path:
        sys.path.insert(0, REF)

    # torchvision stub (util.box_ops touches ops.boxes.box_area; util.misc
    # reads __version__)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.__version__ = "0.15"
        ops = types.ModuleType("torchvision.ops")
        boxes_mod = types.ModuleType("torchvision.ops.boxes")
        boxes_mod.box_area = lambda b: (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        ops.boxes = boxes_mod
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
        sys.modules["torchvision.ops.boxes"] = boxes_mod

    # util.misc stub: the real one imports torchvision at module scope for
    # onnx guards; only these three symbols are touched by the model path.
    import util  # real reference package (box_ops, rotation_utils)

    misc = types.ModuleType("util.misc")

    class NestedTensor:
        def __init__(self, tensors, mask):
            self.tensors, self.mask = tensors, mask

        def decompose(self):
            return self.tensors, self.mask

    def inverse_sigmoid(x, eps=1e-5):     # util/misc.py:520-524
        x = x.clamp(min=0, max=1)
        x1 = x.clamp(min=eps)
        x2 = (1 - x).clamp(min=eps)
        return torch.log(x1 / x2)

    misc.NestedTensor = NestedTensor
    misc.nested_tensor_from_tensor_list = lambda x: x
    misc.inverse_sigmoid = inverse_sigmoid
    sys.modules["util.misc"] = misc
    sys.modules["util"].misc = misc

    # pure-torch MSDeformAttn with the published module structure + core
    from tests.test_deform_attn import torch_ms_deform_attn

    class MSDeformAttn(nn.Module):
        def __init__(self, d_model=256, n_levels=4, n_heads=8, n_points=4):
            super().__init__()
            self.d_model, self.n_levels = d_model, n_levels
            self.n_heads, self.n_points = n_heads, n_points
            self.sampling_offsets = nn.Linear(d_model, n_heads * n_levels * n_points * 2)
            self.attention_weights = nn.Linear(d_model, n_heads * n_levels * n_points)
            self.value_proj = nn.Linear(d_model, d_model)
            self.output_proj = nn.Linear(d_model, d_model)

        def _reset_parameters(self):
            # grid init (Deformable-DETR); weights get copied out, so this
            # only needs to be deterministic
            nn.init.constant_(self.sampling_offsets.weight, 0.0)
            thetas = torch.arange(self.n_heads, dtype=torch.float32) * (
                2.0 * math.pi / self.n_heads
            )
            grid = torch.stack([thetas.cos(), thetas.sin()], -1)
            grid = (grid / grid.abs().max(-1, keepdim=True)[0]).view(
                self.n_heads, 1, 1, 2
            ).repeat(1, self.n_levels, self.n_points, 1)
            for i in range(self.n_points):
                grid[:, :, i, :] *= i + 1
            with torch.no_grad():
                self.sampling_offsets.bias = nn.Parameter(grid.view(-1))
            nn.init.constant_(self.attention_weights.weight, 0.0)
            nn.init.constant_(self.attention_weights.bias, 0.0)
            nn.init.xavier_uniform_(self.value_proj.weight)
            nn.init.constant_(self.value_proj.bias, 0.0)
            nn.init.xavier_uniform_(self.output_proj.weight)
            nn.init.constant_(self.output_proj.bias, 0.0)

        def forward(self, query, reference_points, input_flatten, input_spatial_shapes,
                    input_level_start_index, input_padding_mask=None):
            N, Len_q, _ = query.shape
            value = self.value_proj(input_flatten)
            if input_padding_mask is not None:
                value = value.masked_fill(input_padding_mask[..., None], 0.0)
            value = value.view(N, value.shape[1], self.n_heads, self.d_model // self.n_heads)
            offsets = self.sampling_offsets(query).view(
                N, Len_q, self.n_heads, self.n_levels, self.n_points, 2)
            attn = self.attention_weights(query).view(
                N, Len_q, self.n_heads, self.n_levels * self.n_points)
            attn = F.softmax(attn, -1).view(
                N, Len_q, self.n_heads, self.n_levels, self.n_points)
            assert reference_points.shape[-1] == 2
            normalizer = torch.stack(
                [input_spatial_shapes[..., 1], input_spatial_shapes[..., 0]], -1)
            locations = (
                reference_points[:, :, None, :, None, :]
                + offsets / normalizer[None, None, None, :, None, :]
            )
            shapes = [(int(h), int(w)) for h, w in input_spatial_shapes]
            out = torch_ms_deform_attn(value, shapes, locations, attn)
            return self.output_proj(out)

    da = types.ModuleType("deformable_attention")
    da.MSDeformAttn = MSDeformAttn
    sys.modules["deformable_attention"] = da

    # models package: real position_encoding + deformable_transformer,
    # stubbed backbone/matcher factories (unused in this test)
    models_pkg = types.ModuleType("models")
    models_pkg.__path__ = [f"{REF}/models"]
    sys.modules["models"] = models_pkg
    for stub_name, attrs in (
        ("models.backbone", {"build_backbone": lambda args: None}),
        ("models.matcher", {"build_matcher": lambda args: None}),
    ):
        m = types.ModuleType(stub_name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[stub_name] = m

    def real(name, rel):
        spec = importlib.util.spec_from_file_location(name, f"{REF}/{rel}")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    pe = real("models.position_encoding", "models/position_encoding.py")
    dt = real("models.deformable_transformer", "models/deformable_transformer.py")
    pet = real("models.pose_estimation_transformer",
               "models/pose_estimation_transformer.py")
    return pet, dt, pe, NestedTensor


@pytest.fixture(scope="module", params=["tiny", "paper_dims"])
def parity_setup(request):
    import torch
    from torch import nn

    # rebind the geometry globals for this parametrization (the module-scope
    # fixture runs once per param; tests under it read the same globals)
    globals().update(DIM_CONFIGS[request.param])

    pet, dt, pe, NestedTensor = _load_reference_poet()
    rng = np.random.default_rng(7)

    # shared multi-scale features
    global _FAKE_FEATS
    _FAKE_FEATS = [
        rng.normal(size=(B, h, w, 256)).astype(np.float32) for h, w in FEAT_SHAPES
    ]

    class FakeJoiner(nn.Sequential):
        """Reference-side feature injection; index [1] must be the positional
        embedding module (PoET uses self.backbone[1] for extra levels)."""

        def __init__(self):
            pos = pe.PositionEmbeddingSine(HID // 2, normalize=True)
            super().__init__(nn.Identity(), pos)
            self.strides = [16, 32, 64]
            self.num_channels = [256, 256, 256]

        def forward(self, samples):
            feats, pos = [], []
            for f in _FAKE_FEATS:
                t = torch.from_numpy(f).permute(0, 3, 1, 2).contiguous()
                m = torch.zeros(t.shape[0], t.shape[2], t.shape[3], dtype=torch.bool)
                nt = NestedTensor(t, m)
                feats.append(nt)
                pos.append(self[1](nt).to(t.dtype))
            return feats, pos, None

    def build_ref(class_mode):
        transformer = dt.DeformableTransformer(
            d_model=HID, nhead=HEADS, num_encoder_layers=ENC,
            num_decoder_layers=DEC, dim_feedforward=FFN, dropout=0.0,
            activation="relu", return_intermediate_dec=True,
            num_feature_levels=LEVELS, dec_n_points=4, enc_n_points=4,
        )
        ref_model = pet.PoET(
            FakeJoiner(), transformer, num_queries=Q, num_feature_levels=LEVELS,
            n_classes=NCLS, bbox_mode="gt", ref_points_mode="bbox",
            query_embedding_mode="bbox", rotation_mode="6d",
            class_mode=class_mode, aleatoric=False, aux_loss=True,
            backbone_type="maskrcnn",
        )
        ref_model.eval()
        return ref_model

    # shared inputs
    images = rng.uniform(size=(B, IMG_H, IMG_W, 3)).astype(np.float32)
    n_boxes = np.array([3, Q], dtype=np.int32)
    boxes = rng.uniform(0.2, 0.6, size=(B, Q, 4)).astype(np.float32)
    boxes[..., 2:] = rng.uniform(0.05, 0.3, size=(B, Q, 2))
    labels = rng.integers(1, NCLS + 1, size=(B, Q)).astype(np.int32)

    return build_ref, images, boxes, labels, n_boxes


@pytest.mark.parametrize("class_mode", ["agnostic", "specific"])
def test_full_forward_matches_reference(parity_setup, class_mode):
    import torch

    build_ref, images, boxes, labels, n_boxes = parity_setup
    ref_model = build_ref(class_mode)

    # ---- reference forward (gt mode, ragged targets) ----
    t_images = torch.from_numpy(images).permute(0, 3, 1, 2).contiguous()
    samples = sys.modules["util.misc"].NestedTensor(
        t_images, torch.zeros(B, IMG_H, IMG_W, dtype=torch.bool)
    )
    t_targets = [
        {
            "boxes": torch.from_numpy(boxes[b, : n_boxes[b]]),
            "labels": torch.from_numpy(labels[b, : n_boxes[b]].astype(np.int64)),
        }
        for b in range(B)
    ]
    with torch.no_grad():
        ref_out, ref_n = ref_model(samples, t_targets)

    # ---- our model with converted weights ----
    from poet_tpu.config import PoETConfig
    from poet_tpu.engine.checkpoint import merge_params
    from poet_tpu.models.poet import PoET as OurPoET
    from poet_tpu.utils.torch_import import convert_poet_checkpoint

    cfg = PoETConfig()
    m = cfg.model
    m.hidden_dim, m.nheads, m.enc_layers, m.dec_layers = HID, HEADS, ENC, DEC
    m.dim_feedforward, m.num_queries, m.n_classes = FFN, Q, NCLS
    m.dropout = 0.0
    m.class_mode = class_mode
    our_model = OurPoET(backbone=_JaxFakeBackbone(), cfg=m)

    j_images = jnp.asarray(images)
    j_mask = jnp.zeros((B, IMG_H, IMG_W), bool)
    pad_boxes = boxes.copy()
    pad_labels = labels.copy()
    for b in range(B):
        pad_boxes[b, n_boxes[b]:] = -1.0
        pad_labels[b, n_boxes[b]:] = -1
    targets = {
        "boxes": jnp.asarray(pad_boxes),
        "labels": jnp.asarray(pad_labels),
        "n_boxes": jnp.asarray(n_boxes),
    }

    template = our_model.init(jax.random.PRNGKey(0), j_images, j_mask, targets)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    converted = convert_poet_checkpoint(sd, ENC, DEC, HEADS)
    merged, missing, unexpected = merge_params(template, {"params": converted})
    # the reference creates its reference_points Linear unconditionally
    # (deformable_transformer.py:49) but only uses it when no reference
    # points are passed; ours is created lazily, so in bbox mode it is an
    # expected extra on the torch side.
    assert unexpected == ["params.transformer.reference_points"], unexpected
    assert missing == [], missing

    out = our_model.apply(merged, j_images, j_mask, targets, deterministic=True)

    # reference final layer = ours[-1]; aux_outputs cover earlier layers
    np.testing.assert_allclose(
        np.asarray(out["translations"][-1]),
        ref_out["pred_translation"].numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["rotations"][-1]),
        ref_out["pred_rotation"].numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"]), ref_out["pred_boxes"].numpy(), atol=1e-6)
    assert list(np.asarray(out["n_boxes"])) == list(ref_n)
    for lvl, aux in enumerate(ref_out["aux_outputs"]):
        np.testing.assert_allclose(
            np.asarray(out["translations"][lvl]),
            aux["pred_translation"].numpy(), atol=2e-4, rtol=1e-3,
            err_msg=f"aux layer {lvl}")


def test_zoo_pth_resume_roundtrip_at_scale(parity_setup, tmp_path):
    """VERDICT r1 item 7: the REAL reference model's state_dict, saved as a
    zoo-format .pth file, round-trips through the --resume dispatcher
    (load_resume -> load_state_dict_file -> assemble_poet_params) into a full
    forward that matches the torch model. At paper_dims this is a paper-scale
    checkpoint import: 5 enc / 5 dec / hidden 256 / 16 heads, the exact zoo
    geometry (/root/reference/README.md:109-111)."""
    import torch

    from poet_tpu.config import PoETConfig
    from poet_tpu.engine.checkpoint import load_resume, merge_params
    from poet_tpu.models.poet import PoET as OurPoET

    build_ref, images, boxes, labels, n_boxes = parity_setup
    ref_model = build_ref("agnostic")

    # zoo payload shape: {"model": state_dict, "epoch": N, "args": ...}
    # (main.py:288-298 reads obj["model"]); DDP "module." prefixes included
    sd = ref_model.state_dict()
    ckpt = tmp_path / "poet_zoo_scale.pth"
    torch.save(
        {"model": {f"module.{k}": v for k, v in sd.items()}, "epoch": 49},
        ckpt,
    )

    payload, start_epoch = load_resume(str(ckpt), enc_layers=ENC,
                                       dec_layers=DEC, nheads=HEADS)
    assert start_epoch == 0  # zoo files restore params only

    cfg = PoETConfig()
    m = cfg.model
    m.hidden_dim, m.nheads, m.enc_layers, m.dec_layers = HID, HEADS, ENC, DEC
    m.dim_feedforward, m.num_queries, m.n_classes = FFN, Q, NCLS
    m.dropout = 0.0
    m.class_mode = "agnostic"  # matches build_ref above (config default: specific)
    our_model = OurPoET(backbone=_JaxFakeBackbone(), cfg=m)

    j_images = jnp.asarray(images)
    j_mask = jnp.zeros((B, IMG_H, IMG_W), bool)
    pad_boxes, pad_labels = boxes.copy(), labels.copy()
    for b in range(B):
        pad_boxes[b, n_boxes[b]:] = -1.0
        pad_labels[b, n_boxes[b]:] = -1
    targets = {
        "boxes": jnp.asarray(pad_boxes),
        "labels": jnp.asarray(pad_labels),
        "n_boxes": jnp.asarray(n_boxes),
    }
    template = our_model.init(jax.random.PRNGKey(0), j_images, j_mask, targets)
    merged, missing, unexpected = merge_params(template, payload["params"])
    assert unexpected == ["params.transformer.reference_points"], unexpected
    assert missing == [], missing

    out = our_model.apply(merged, j_images, j_mask, targets, deterministic=True)

    t_images = torch.from_numpy(images).permute(0, 3, 1, 2).contiguous()
    samples = sys.modules["util.misc"].NestedTensor(
        t_images, torch.zeros(B, IMG_H, IMG_W, dtype=torch.bool))
    t_targets = [
        {"boxes": torch.from_numpy(boxes[b, : n_boxes[b]]),
         "labels": torch.from_numpy(labels[b, : n_boxes[b]].astype(np.int64))}
        for b in range(B)
    ]
    with torch.no_grad():
        ref_out, _ = ref_model(samples, t_targets)
    np.testing.assert_allclose(
        np.asarray(out["translations"][-1]),
        ref_out["pred_translation"].numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["rotations"][-1]),
        ref_out["pred_rotation"].numpy(), atol=5e-4, rtol=1e-3)


def test_image_to_pose_with_real_conv_backbone(tmp_path):
    """IMAGE-in -> pose-out parity with the REAL convolutional backbone on
    both sides (VERDICT r1 item 3, second half): the torch side runs the
    reference PoET around the independent functional ResNet-50-FPN oracle
    (tests/test_detector_numeric_parity.py); our side runs the production
    MaskRCNNFeatureBackbone. Both share one torchvision-named weight set, so
    the entire image -> features -> transformer -> pose path is compared
    weight-for-weight, with no feature injection."""
    import torch
    from torch import nn

    from tests.test_detector_numeric_parity import _rcnn_state_dict, t_resnet_fpn

    pet, dt, pe, NestedTensor = _load_reference_poet()
    hid, heads, enc, dec, ffn, q, ncls = 64, 4, 2, 2, 128, 5, 4
    ih, iw, b = 128, 160, 2
    rng = np.random.default_rng(3)
    rcnn_sd = _rcnn_state_dict()

    class OracleJoiner(nn.Sequential):
        def __init__(self):
            pos = pe.PositionEmbeddingSine(hid // 2, normalize=True)
            super().__init__(nn.Identity(), pos)
            self.strides = [16, 32, 64]
            self.num_channels = [256, 256, 256]

        def forward(self, samples):
            with torch.no_grad():
                fd = t_resnet_fpn(rcnn_sd, samples.tensors)
            feats, pos = [], []
            for k in ["2", "3", "pool"]:
                t = fd[k]
                m = torch.zeros(t.shape[0], t.shape[2], t.shape[3],
                                dtype=torch.bool)
                nt = NestedTensor(t, m)
                feats.append(nt)
                pos.append(self[1](nt).to(t.dtype))
            return feats, pos, None

    transformer = dt.DeformableTransformer(
        d_model=hid, nhead=heads, num_encoder_layers=enc,
        num_decoder_layers=dec, dim_feedforward=ffn, dropout=0.0,
        activation="relu", return_intermediate_dec=True,
        num_feature_levels=4, dec_n_points=4, enc_n_points=4)
    ref_model = pet.PoET(
        OracleJoiner(), transformer, num_queries=q, num_feature_levels=4,
        n_classes=ncls, bbox_mode="gt", ref_points_mode="bbox",
        query_embedding_mode="bbox", rotation_mode="6d",
        class_mode="agnostic", aleatoric=False, aux_loss=True,
        backbone_type="maskrcnn")
    ref_model.eval()

    images = rng.uniform(size=(b, ih, iw, 3)).astype(np.float32)
    n_boxes = np.array([3, q], dtype=np.int32)
    boxes = rng.uniform(0.2, 0.6, size=(b, q, 4)).astype(np.float32)
    boxes[..., 2:] = rng.uniform(0.05, 0.3, size=(b, q, 2))
    labels = rng.integers(1, ncls + 1, size=(b, q)).astype(np.int32)

    t_images = torch.from_numpy(images).permute(0, 3, 1, 2).contiguous()
    samples = sys.modules["util.misc"].NestedTensor(
        t_images, torch.zeros(b, ih, iw, dtype=torch.bool))
    t_targets = [
        {"boxes": torch.from_numpy(boxes[i, : n_boxes[i]]),
         "labels": torch.from_numpy(labels[i, : n_boxes[i]].astype(np.int64))}
        for i in range(b)
    ]
    with torch.no_grad():
        ref_out, _ = ref_model(samples, t_targets)

    # ---- ours: full production model (real ResNetFPN feature backbone) ----
    from poet_tpu.engine.checkpoint import merge_params
    from poet_tpu.models import build_model
    from poet_tpu.utils.torch_import import (
        convert_poet_checkpoint,
        convert_resnet_fpn,
    )
    from tests.test_model import tiny_config

    cfg = tiny_config(class_mode="agnostic")
    model = build_model(cfg)
    j_images = jnp.asarray(images)
    j_mask = jnp.zeros((b, ih, iw), bool)
    pad_boxes, pad_labels = boxes.copy(), labels.copy()
    for i in range(b):
        pad_boxes[i, n_boxes[i]:] = -1.0
        pad_labels[i, n_boxes[i]:] = -1
    targets = {"boxes": jnp.asarray(pad_boxes),
               "labels": jnp.asarray(pad_labels),
               "n_boxes": jnp.asarray(n_boxes)}
    template = model.init(jax.random.PRNGKey(0), j_images, j_mask, targets)

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    tree = convert_poet_checkpoint(sd, enc, dec, heads)
    tree["backbone"] = {"fpn_body": convert_resnet_fpn(rcnn_sd)}
    merged, missing, unexpected = merge_params(template, {"params": tree})
    assert missing == [], missing
    # expected extras: the torch-side unconditional reference_points Linear,
    # and the FPN inner/layer convs for the stride-4/8 levels our
    # feature-only backbone never computes (FPN.levels pruning)
    allowed = {"params.transformer.reference_points"} | {
        f"params.backbone.fpn_body.fpn.{kind}_{i}" for kind in ("inner", "layer")
        for i in (0, 1)
    }
    assert set(unexpected) <= allowed, unexpected

    out = model.apply(merged, j_images, j_mask, targets, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out["translations"][-1]),
        ref_out["pred_translation"].numpy(), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["rotations"][-1]),
        ref_out["pred_rotation"].numpy(), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"]), ref_out["pred_boxes"].numpy(), atol=1e-6)
