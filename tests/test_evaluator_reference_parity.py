"""End-to-end parity of PoseEvaluator vs the reference's OWN evaluator classes.

Loads /root/reference/evaluation_tools/pose_evaluator.py and
pose_evaluator_lmo.py (pure numpy/scipy — runnable here), feeds the reference
evaluator and ours IDENTICAL synthetic models + matched pose sets, runs every
metric pass into temp dirs, and compares the emitted JSON numbers.

This is the strongest offline evidence for the ADD(-S) parity target
(BASELINE.md: "within 0.1% of the PyTorch reference"): the full metric
pipeline — per-class ADD/ADD-S/ADD(-S) threshold accuracies, the Simpson AUC
over the 0.1 mm grid, and the class-averaged translation/rotation errors —
agrees with the reference's own code to float precision, for both the YCB-V
(absolute thresholds) and LM-O (diameter-relative) variants.

Reference: evaluation_tools/pose_evaluator.py:67-615,
           evaluation_tools/pose_evaluator_lmo.py:67-248.
"""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

from poet_tpu.evaluation.pose_evaluator import PoseEvaluator

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)


def _load_ref(name, rel_path):
    import scipy.integrate

    if not hasattr(scipy.integrate, "simps"):
        # scipy >= 1.14 removed the `simps` alias the reference imports
        # (pose_evaluator.py:153). Same function, new name.
        scipy.integrate.simps = scipy.integrate.simpson
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{rel_path}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


# --------------------------------------------------------------------------
# Synthetic dataset: 3 classes (one symmetric), error magnitudes spread
# across the whole threshold ladder so every accuracy bucket is exercised.
# --------------------------------------------------------------------------

CLASSES = ["obj_a", "obj_b", "obj_c"]
SYMMETRY = {"obj_a": False, "obj_b": True, "obj_c": False}
N_PTS = {"obj_a": 173, "obj_b": 211, "obj_c": 97}
DIAMETER_MM = {"obj_a": 120.0, "obj_b": 85.0, "obj_c": 240.0}
N_POSES = {"obj_a": 23, "obj_b": 17, "obj_c": 11}


def _random_rotation(rng):
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    q = q * np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def _rotation_perturbation(rng, degrees):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    ang = np.radians(degrees)
    K = np.array([
        [0.0, -axis[2], axis[1]],
        [axis[2], 0.0, -axis[0]],
        [-axis[1], axis[0], 0.0],
    ])
    return np.eye(3) + np.sin(ang) * K + (1.0 - np.cos(ang)) * (K @ K)


def _synthetic(seed=7):
    rng = np.random.default_rng(seed)
    models = {
        c: {"pts": rng.uniform(-0.05, 0.05, size=(N_PTS[c], 3))} for c in CLASSES
    }
    models_info = {c: {"diameter": DIAMETER_MM[c]} for c in CLASSES}
    pairs = {}
    for c in CLASSES:
        n = N_POSES[c]
        # log-spaced magnitudes: from "perfect" to "outside every threshold"
        t_mags = np.logspace(np.log10(3e-4), np.log10(0.15), n)
        r_degs = np.logspace(np.log10(0.1), np.log10(45.0), n)
        cls_pairs = []
        for j in range(n):
            R_gt = _random_rotation(rng)
            t_gt = rng.uniform(-0.5, 0.5, size=3)
            direction = rng.normal(size=3)
            direction /= np.linalg.norm(direction)
            R_pred = _rotation_perturbation(rng, r_degs[j]) @ R_gt
            t_pred = t_gt + t_mags[j] * direction
            gt = np.concatenate([R_gt, t_gt.reshape(3, 1)], axis=1)
            pred = np.concatenate([R_pred, t_pred.reshape(3, 1)], axis=1)
            cls_pairs.append((pred, gt))
        pairs[c] = cls_pairs
    return models, models_info, pairs


def _feed(evaluator, pairs):
    """Both evaluators share the reference's attribute surface."""
    for c in CLASSES:
        for pred, gt in pairs[c]:
            evaluator.poses_pred[c].append(pred)
            evaluator.poses_gt[c].append(gt)
            evaluator.poses_img[c].append("img.png")
            evaluator.camera_intrinsics[c].append(None)
            evaluator.num[c] += 1


def _run_pass(evaluator, method, out_root, json_rel):
    out = os.path.join(out_root, method) + "/"
    os.makedirs(out, exist_ok=True)
    getattr(evaluator, method)(out)
    with open(os.path.join(out, json_rel)) as f:
        return json.load(f)


# (method, json file it writes)    — names match the reference exactly
METRIC_PASSES = [
    ("evaluate_pose_adds", "adds/adds.json"),
    ("evaluate_pose_adi", "adi/adds.json"),
    ("evaluate_pose_add", "add/add.json"),
]
AVG_PASSES = [
    ("calculate_class_avg_translation_error", "avg_t_error/avg_t_error.json"),
    ("calculate_class_avg_rotation_error", "avg_rot_error/avg_rot_error.json"),
]


def _assert_metric_json_close(ours, ref, has_auc=True):
    """has_auc=False for LM-O: the reference's LMO evaluator reports ONLY the
    diameter-relative threshold accuracies — no AUC sweep exists there
    (pose_evaluator_lmo.py:136-197). Ours emits auc for LM-O too (extension);
    only the reference-produced keys are compared."""
    # global thresholds list
    assert ours["thresholds"] == ref["thresholds"]
    for cls in CLASSES:
        o, r = ours[cls], ref[cls]
        # raw correct-pose counts at the 3 reporting thresholds: ADD classes
        # are computed in f64 on both sides (exact); the symmetric class's
        # ADD-S runs on-device in f32 here vs cKDTree f64 there — error
        # magnitudes are ~1e-6-separated from thresholds at this seed, so
        # counts still match exactly.
        for key in ("0.02", "0.05", "0.10"):
            assert o["threshold"][key] == r["threshold"][key], (cls, key)
        if has_auc:
            # the 1000-point AUC sweep: allow single-grid-cell flips from f32
            curve_o = np.asarray(o["threshold"]["mean"])
            curve_r = np.asarray(r["threshold"]["mean"])
            assert curve_o.shape == curve_r.shape
            assert np.max(np.abs(curve_o - curve_r)) <= 1.0, cls
            np.testing.assert_allclose(
                o["accuracy"]["auc"], r["accuracy"]["auc"], atol=0.05
            )
        for key in ("n_poses", "0.02", "0.05", "0.10"):
            np.testing.assert_allclose(o["accuracy"][key], r["accuracy"][key])
    # class-mean summary
    for key in ("0.02", "0.05", "0.10"):
        np.testing.assert_allclose(ours["accuracy"][key], ref["accuracy"][key])
    if has_auc:
        np.testing.assert_allclose(
            ours["accuracy"]["auc"], ref["accuracy"]["auc"], atol=0.05
        )


@pytest.fixture(scope="module")
def synth():
    return _synthetic()


def test_ycbv_evaluator_matches_reference(tmp_path, synth):
    models, models_info, pairs = synth
    ref_mod = _load_ref("ref_pose_evaluator", "evaluation_tools/pose_evaluator.py")
    ref_ev = ref_mod.PoseEvaluator(models, list(CLASSES), models_info, SYMMETRY)
    our_ev = PoseEvaluator(models, list(CLASSES), models_info, SYMMETRY,
                           diameter_relative=False)
    _feed(ref_ev, pairs)
    _feed(our_ev, pairs)

    for method, json_rel in METRIC_PASSES:
        ref_json = _run_pass(ref_ev, method, str(tmp_path / "ref"), json_rel)
        our_json = _run_pass(our_ev, method, str(tmp_path / "ours"), json_rel)
        _assert_metric_json_close(our_json, ref_json, has_auc=True)

    for method, json_rel in AVG_PASSES:
        ref_json = _run_pass(ref_ev, method, str(tmp_path / "ref"), json_rel)
        our_json = _run_pass(our_ev, method, str(tmp_path / "ours"), json_rel)
        for cls in CLASSES:
            np.testing.assert_allclose(our_json[cls], ref_json[cls], rtol=1e-9)
        np.testing.assert_allclose(our_json["mean"], ref_json["mean"], rtol=1e-9)


def test_lmo_evaluator_matches_reference(tmp_path, synth):
    models, models_info, pairs = synth
    ref_mod = _load_ref(
        "ref_pose_evaluator_lmo", "evaluation_tools/pose_evaluator_lmo.py"
    )
    ref_ev = ref_mod.PoseEvaluatorLMO(models, list(CLASSES), models_info, SYMMETRY)
    our_ev = PoseEvaluator(models, list(CLASSES), models_info, SYMMETRY,
                           diameter_relative=True)
    _feed(ref_ev, pairs)
    _feed(our_ev, pairs)

    for method, json_rel in METRIC_PASSES:
        ref_json = _run_pass(ref_ev, method, str(tmp_path / "ref"), json_rel)
        our_json = _run_pass(our_ev, method, str(tmp_path / "ours"), json_rel)
        _assert_metric_json_close(our_json, ref_json, has_auc=False)

    for method, json_rel in AVG_PASSES:
        ref_json = _run_pass(ref_ev, method, str(tmp_path / "ref"), json_rel)
        our_json = _run_pass(our_ev, method, str(tmp_path / "ours"), json_rel)
        for cls in CLASSES:
            np.testing.assert_allclose(our_json[cls], ref_json[cls], rtol=1e-9)
        np.testing.assert_allclose(our_json["mean"], ref_json["mean"], rtol=1e-9)
