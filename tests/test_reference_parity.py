"""DIRECT parity tests against the reference implementation.

When the reference tree is mounted (read-only) at /root/reference, import its
pure-math modules (torch/numpy CPU, no CUDA deps) and compare our outputs
bit-for-bit-ish on random inputs. Modules whose import chain pulls CUDA-only
or absent packages (torchvision, deformable_attention) get minimal stubs —
only for symbols the tested code actually touches.

Skipped cleanly when the reference is not mounted.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp


def _load_ref_module(name, rel_path):
    """Load a reference module directly by path, bypassing package __init__
    chains that import CUDA-only/absent deps."""
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{rel_path}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not __import__("os").path.isdir(REF), reason="reference tree not mounted"
)


@pytest.fixture(scope="module", autouse=True)
def ref_path():
    sys.path.insert(0, REF)
    # stub torchvision (only box_area is touched by util.box_ops)
    if "torchvision" not in sys.modules:
        import torch

        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")
        boxes_mod = types.ModuleType("torchvision.ops.boxes")

        def box_area(b):
            return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

        boxes_mod.box_area = box_area
        ops.boxes = boxes_mod
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
        sys.modules["torchvision.ops.boxes"] = boxes_mod
    yield
    sys.path.remove(REF)


def test_so3_maps_match_reference(rng):
    import torch
    from util import rotation_utils as ref_rot

    from poet_tpu.utils import rotations as ours

    v = rng.normal(size=(32, 3)).astype(np.float32)
    ref_R = ref_rot.so3_exp_map(torch.from_numpy(v)).numpy()
    our_R = np.asarray(ours.so3_exp_map(jnp.asarray(v)))
    np.testing.assert_allclose(our_R, ref_R, atol=1e-6)

    ref_log = ref_rot.so3_log_map(torch.from_numpy(ref_R)).numpy()
    our_log = np.asarray(ours.so3_log_map(jnp.asarray(ref_R)))
    np.testing.assert_allclose(our_log, ref_log, atol=1e-5)

    ref_ang = ref_rot.so3_rotation_angle(torch.from_numpy(ref_R)).numpy()
    our_ang = np.asarray(ours.so3_rotation_angle(jnp.asarray(ref_R)))
    np.testing.assert_allclose(our_ang, ref_ang, atol=1e-5)

    h = ref_rot.hat(torch.from_numpy(v)).numpy()
    np.testing.assert_allclose(np.asarray(ours.hat(jnp.asarray(v))), h, atol=0)


def test_acos_extrapolation_matches_reference(rng):
    import torch
    from util import rotation_utils as ref_rot

    from poet_tpu.utils import rotations as ours

    x = np.concatenate([
        np.linspace(-1.2, 1.2, 201), rng.uniform(-1.05, 1.05, 64)
    ]).astype(np.float32)
    ref = ref_rot.acos_linear_extrapolation(torch.from_numpy(x)).numpy()
    out = np.asarray(ours.acos_linear_extrapolation(jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-6)


def test_quaternions_match_reference(rng):
    from util import quaternion_ops as ref_q

    from poet_tpu.utils import quaternions as ours

    q = rng.normal(size=(24, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    ref_R = ref_q.quat2rot(q)
    our_R = np.asarray(ours.quat2rot(jnp.asarray(q)))
    np.testing.assert_allclose(our_R, ref_R, atol=1e-6)

    ref_back = ref_q.rot2quat(ref_R)
    our_back = np.asarray(ours.rot2quat(jnp.asarray(ref_R)))
    # both fix sign w >= 0; eigenvector sign/ordering can differ only by
    # numerical ties, so compare the rotations they represent
    np.testing.assert_allclose(np.abs(our_back), np.abs(ref_back), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ours.quat2rot(jnp.asarray(our_back))),
        ref_q.quat2rot(ref_back), atol=1e-5,
    )


def test_box_ops_match_reference(rng):
    import torch
    from util import box_ops as ref_b

    from poet_tpu.utils import boxes as ours

    cxcywh = rng.uniform(0.2, 0.8, size=(16, 4)).astype(np.float32)
    cxcywh[:, 2:] = rng.uniform(0.05, 0.3, size=(16, 2))
    t = torch.from_numpy(cxcywh)
    np.testing.assert_allclose(
        np.asarray(ours.box_cxcywh_to_xyxy(jnp.asarray(cxcywh))),
        ref_b.box_cxcywh_to_xyxy(t).numpy(), atol=1e-7,
    )
    xyxy = ref_b.box_cxcywh_to_xyxy(t)
    np.testing.assert_allclose(
        np.asarray(ours.generalized_box_iou(
            jnp.asarray(xyxy.numpy()[:8]), jnp.asarray(xyxy.numpy()[8:]))),
        ref_b.generalized_box_iou(xyxy[:8], xyxy[8:]).numpy(), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ours.box_normalize_cxcywh(jnp.asarray(cxcywh), (480, 640))),
        ref_b.box_normalize_cxcywh(t, (480, 640)).numpy(), atol=1e-7,
    )


def test_pose_matcher_matches_reference(rng):
    """Run the reference PoseMatcher (scipy/CPU) against our in-jit matcher."""
    import torch

    ref_matcher_mod = _load_ref_module("ref_matcher", "models/matcher.py")
    PoseMatcher = ref_matcher_mod.PoseMatcher

    from poet_tpu.models.matcher import match_poses

    B, Q = 3, 7
    for mode in ("gt", "backbone"):
        boxes = rng.uniform(0.2, 0.7, size=(B, Q, 4)).astype(np.float32)
        boxes[..., 2:] = rng.uniform(0.05, 0.3, size=(B, Q, 2))
        tgt_boxes = (boxes + rng.normal(scale=0.02, size=boxes.shape)).astype(np.float32)
        labels = rng.integers(1, 5, size=(B, Q)).astype(np.int64)
        tgt_labels = labels.copy()
        flip = rng.uniform(size=labels.shape) < 0.2
        tgt_labels[flip] += 1
        n = rng.integers(2, Q + 1, size=(B,)).astype(np.int64)

        outputs = {
            "pred_boxes": torch.from_numpy(boxes),
            "pred_classes": torch.from_numpy(labels),
        }
        targets = [
            {
                "boxes": torch.from_numpy(tgt_boxes[b, : n[b]]),
                "labels": torch.from_numpy(tgt_labels[b, : n[b]]),
            }
            for b in range(B)
        ]
        ref_matcher = PoseMatcher(cost_bbox=1.0, cost_class=1.0,
                                  bbox_mode=mode, class_mode="specific")
        ref_idx = ref_matcher(outputs, targets, list(n))
        ref_pairs = [
            set(zip(i.numpy().tolist(), j.numpy().tolist())) for i, j in ref_idx
        ]

        res = match_poses(
            jnp.asarray(boxes), jnp.asarray(labels.astype(np.int32)),
            jnp.asarray(tgt_boxes), jnp.asarray(tgt_labels.astype(np.int32)),
            jnp.asarray(n.astype(np.int32)), jnp.asarray(n.astype(np.int32)),
            bbox_mode=mode, class_mode="specific",
        )
        tgt_idx = np.asarray(res.tgt_idx)
        valid = np.asarray(res.valid)
        our_pairs = [
            {(i, int(tgt_idx[b, i])) for i in range(Q) if valid[b, i]}
            for b in range(B)
        ]
        assert our_pairs == ref_pairs, (mode, our_pairs, ref_pairs)


def test_bbox_embedding_matches_reference(rng):
    """BoundingBoxEmbeddingSine: stub util.misc (torchvision chain) first."""
    import torch

    # position_encoding imports `from util.misc import NestedTensor`
    import util  # reference package
    misc_stub = types.ModuleType("util.misc")

    class NestedTensor:  # minimal stand-in; not touched by the bbox embedding
        def __init__(self, tensors, mask):
            self.tensors, self.mask = tensors, mask

        def decompose(self):
            return self.tensors, self.mask

    misc_stub.NestedTensor = NestedTensor
    sys.modules["util.misc"] = misc_stub
    util.misc = misc_stub
    pe = _load_ref_module("ref_position_encoding", "models/position_encoding.py")
    BoundingBoxEmbeddingSine = pe.BoundingBoxEmbeddingSine
    PositionEmbeddingSine = pe.PositionEmbeddingSine

    from poet_tpu.ops.embeddings import bbox_embedding_sine, position_embedding_sine

    boxes = rng.uniform(0, 1, size=(9, 4)).astype(np.float32)
    ref = BoundingBoxEmbeddingSine(num_pos_feats=32)(torch.from_numpy(boxes)).numpy()
    ours = np.asarray(bbox_embedding_sine(jnp.asarray(boxes), num_pos_feats=32))
    np.testing.assert_allclose(ours, ref, atol=2e-5)

    # 2D sine embedding with padding
    mask = np.zeros((2, 12, 9), dtype=bool)
    mask[:, 10:, :] = True
    x = torch.zeros(2, 3, 12, 9)
    ref2 = PositionEmbeddingSine(num_pos_feats=16, normalize=True)(
        NestedTensor(x, torch.from_numpy(mask))
    ).numpy()  # (B, C, H, W)
    ours2 = np.asarray(position_embedding_sine(jnp.asarray(mask), num_pos_feats=16))
    valid = ~mask[0]
    np.testing.assert_allclose(
        ours2.transpose(0, 3, 1, 2)[0][:, valid], ref2[0][:, valid], atol=3e-5
    )


def test_learned_position_embedding_matches_reference(rng):
    """Weight-shared parity vs PositionEmbeddingLearned
    (models/position_encoding.py:87-112): copy the reference's random row/col
    tables into our module and compare the (B, H, W, 2F) output — including
    the x-then-y channel order, the opposite of the sine embedding's."""
    import torch

    import util  # noqa: F401  (stub chain set up by earlier tests' fixture)
    if "util.misc" not in sys.modules or not hasattr(
            sys.modules["util.misc"], "NestedTensor"):
        misc_stub = types.ModuleType("util.misc")

        class NestedTensor:
            def __init__(self, tensors, mask):
                self.tensors, self.mask = tensors, mask

        misc_stub.NestedTensor = NestedTensor
        sys.modules["util.misc"] = misc_stub
        sys.modules["util"].misc = misc_stub
    NestedTensor = sys.modules["util.misc"].NestedTensor
    pe = _load_ref_module("ref_position_encoding", "models/position_encoding.py")

    ref_mod = pe.PositionEmbeddingLearned(num_pos_feats=16)
    row = ref_mod.row_embed.weight.detach().numpy()
    col = ref_mod.col_embed.weight.detach().numpy()

    B, H, W = 2, 12, 9
    x = torch.zeros(B, 3, H, W)
    ref = ref_mod(NestedTensor(x, torch.zeros(B, H, W, dtype=torch.bool)))
    ref = ref.detach().numpy()                      # (B, 2F, H, W)

    from poet_tpu.models.backbone import PositionEmbeddingLearned

    ours = np.asarray(
        PositionEmbeddingLearned(num_pos_feats=16).apply(
            {"params": {"row_embed": jnp.asarray(row), "col_embed": jnp.asarray(col)}},
            jnp.zeros((B, H, W), bool),
        )
    )                                               # (B, H, W, 2F)
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-6)


def test_set_criterion_losses_match_reference(rng):
    """Run the reference SetCriterion (torch CPU) against our criterion on the
    same matched predictions/targets — covers all six loss functions + aux."""
    import torch

    # pose_estimation_transformer is a package-relative module: register the
    # 'models' package with stubs for the heavy siblings it imports.
    import util  # noqa: F401  (real reference package, math modules fine)
    if "util.misc" not in sys.modules or not hasattr(sys.modules["util.misc"], "NestedTensor"):
        misc_stub = types.ModuleType("util.misc")

        class NestedTensor:
            def __init__(self, tensors, mask):
                self.tensors, self.mask = tensors, mask

        misc_stub.NestedTensor = NestedTensor
        misc_stub.nested_tensor_from_tensor_list = lambda x: x
        sys.modules["util.misc"] = misc_stub
        sys.modules["util"].misc = misc_stub
    else:
        sys.modules["util.misc"].nested_tensor_from_tensor_list = lambda x: x

    models_pkg = types.ModuleType("models")
    models_pkg.__path__ = [f"{REF}/models"]
    sys.modules["models"] = models_pkg
    for stub_name, attrs in (
        ("models.backbone", {"build_backbone": lambda args: None}),
        ("models.deformable_transformer",
         {"build_deforamble_transformer": lambda args: None}),
        ("models.matcher", {"build_matcher": lambda args: None}),
        ("models.position_encoding", {"BoundingBoxEmbeddingSine": object}),
    ):
        m = types.ModuleType(stub_name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[stub_name] = m

    spec = importlib.util.spec_from_file_location(
        "models.pose_estimation_transformer",
        f"{REF}/models/pose_estimation_transformer.py",
    )
    pet = importlib.util.module_from_spec(spec)
    sys.modules["models.pose_estimation_transformer"] = pet
    spec.loader.exec_module(pet)

    from scipy.spatial.transform import Rotation as ScipyRot

    from poet_tpu.models import criterion as ours
    from poet_tpu.models.matcher import MatchResult

    B, Q = 2, 5
    n = np.array([4, 3], dtype=np.int64)
    pred_t = rng.normal(size=(B, Q, 3)).astype(np.float32)
    pred_R = ScipyRot.random(B * Q, random_state=1).as_matrix().reshape(B, Q, 3, 3).astype(np.float32)
    pred_q = rng.normal(size=(B, Q, 4)).astype(np.float32)
    pred_q /= np.linalg.norm(pred_q, axis=-1, keepdims=True)
    pred_s_t = rng.normal(size=(B, Q, 3)).astype(np.float32)
    pred_s_r = rng.normal(size=(B, Q, 3)).astype(np.float32)
    tgt_t = rng.normal(size=(B, Q, 3)).astype(np.float32)
    tgt_R = ScipyRot.random(B * Q, random_state=2).as_matrix().reshape(B, Q, 3, 3).astype(np.float32)
    tgt_q = rng.normal(size=(B, Q, 4)).astype(np.float32)
    tgt_q /= np.linalg.norm(tgt_q, axis=-1, keepdims=True)

    # identity match on the first n[b] queries
    indices = [
        (torch.arange(n[b]), torch.arange(n[b])) for b in range(B)
    ]
    match = MatchResult(
        tgt_idx=jnp.asarray(np.tile(np.arange(Q), (B, 1)).astype(np.int32)),
        valid=jnp.asarray(np.arange(Q)[None, :] < n[:, None]),
    )

    crit = pet.SetCriterion(matcher=None, weight_dict={}, losses=[])
    t_outputs = {
        "pred_translation": torch.from_numpy(pred_t),
        "pred_rotation": torch.from_numpy(pred_R),
        "pred_translation_aleatoric": torch.from_numpy(pred_s_t),
        "pred_rotation_aleatoric": torch.from_numpy(pred_s_r),
    }
    t_targets = [
        {
            "relative_position": torch.from_numpy(tgt_t[b, : n[b]]),
            "relative_rotation": torch.from_numpy(tgt_R[b, : n[b]]),
            "relative_quaternions": torch.from_numpy(tgt_q[b, : n[b]]),
        }
        for b in range(B)
    ]

    ref_trans = float(crit.loss_translation(t_outputs, t_targets, indices)["loss_trans"])
    our_trans = float(ours.loss_translation(jnp.asarray(pred_t), jnp.asarray(tgt_t), match))
    np.testing.assert_allclose(our_trans, ref_trans, rtol=1e-5)

    ref_rot = float(crit.loss_rotation(t_outputs, t_targets, indices)["loss_rot"])
    our_rot = float(ours.loss_rotation(jnp.asarray(pred_R), jnp.asarray(tgt_R), match))
    np.testing.assert_allclose(our_rot, ref_rot, rtol=1e-4)

    ref_al_t = float(crit.loss_translation_aleatoric(t_outputs, t_targets, indices)["loss_trans"])
    our_al_t = float(ours.loss_translation_aleatoric(
        jnp.asarray(pred_t), jnp.asarray(pred_s_t), jnp.asarray(tgt_t), match))
    np.testing.assert_allclose(our_al_t, ref_al_t, rtol=1e-5)

    ref_al_r = float(crit.loss_rotation_aleatoric(t_outputs, t_targets, indices)["loss_rot"])
    our_al_r = float(ours.loss_rotation_aleatoric(
        jnp.asarray(pred_R), jnp.asarray(pred_s_r), jnp.asarray(tgt_R), match))
    np.testing.assert_allclose(our_al_r, ref_al_r, rtol=1e-3, atol=1e-4)

    t_outputs_q = dict(t_outputs)
    t_outputs_q["pred_rotation"] = torch.from_numpy(pred_q)
    ref_quat = float(crit.loss_quaternion(t_outputs_q, t_targets, indices)["loss_rot"])
    our_quat = float(ours.loss_quaternion(jnp.asarray(pred_q), jnp.asarray(tgt_q), match))
    np.testing.assert_allclose(our_quat, ref_quat, rtol=1e-4)

    ref_sq = float(crit.loss_silho_quaternion(t_outputs_q, t_targets, indices)["loss_rot"])
    our_sq = float(ours.loss_silho_quaternion(jnp.asarray(pred_q), jnp.asarray(tgt_q), match))
    np.testing.assert_allclose(our_sq, ref_sq, rtol=1e-4)
