"""Evaluator precision at REAL BOP cloud scale (VERDICT r1 item 5).

YCB-V PLY models carry ~10-16k vertices and the reference evaluator
(evaluation_tools/pose_evaluator.py:67-218) scores hundreds of poses per
class through cKDTree-f64 ADD-S and a Simpson AUC at 0.1 mm steps. Our device
pipeline runs ADD-S in f32 — this test pins the f32-vs-f64 error budget at
full scale:

  1. per-pose ADD-S errors: our f32 einsum/bucketed path vs an independent
     scipy cKDTree f64 oracle, on a 15k-point surface-of-revolution cloud
     whose symmetry produces genuine nearest-neighbor ties,
  2. the full evaluator AUC / threshold accuracies vs the reference's own
     PoseEvaluator to within 0.1 (the BASELINE.md 0.1% parity budget on the
     reference's 0-100 AUC scale, pose_evaluator.py:153-155).

Marked slow: the ADD-S brute-force at 15k points is ~100 GFLOP on the CPU
test backend.
"""

import json
import os

import numpy as np
import pytest

from poet_tpu.evaluation.pose_evaluator import (
    PoseEvaluator,
    add_errors,
    adi_errors,
)

REF = "/root/reference"
pytestmark = pytest.mark.slow

N_PTS = 15000
CLASSES = ["rev_sym", "blob_asym"]
SYMMETRY = {"rev_sym": True, "blob_asym": False}
DIAMETER_MM = {"rev_sym": 140.0, "blob_asym": 200.0}


def _revolution_cloud(rng, n=N_PTS):
    """Surface of revolution about z (bottle-ish): rotations about z move
    every point along its own circle -> ADD-S nearest-neighbor ties."""
    z = rng.uniform(-0.07, 0.07, size=n)
    r = 0.03 + 0.015 * np.cos(z * 40.0)
    th = rng.uniform(0, 2 * np.pi, size=n)
    return np.stack([r * np.cos(th), r * np.sin(th), z], axis=1)


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def _rot_axis(rng, deg):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    a = np.radians(deg)
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0.0]])
    return np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K)


def _pose_pairs(rng, n, t_mags, symmetric_axis_spin=False):
    pairs = []
    for j in range(n):
        R_gt, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(R_gt) < 0:
            R_gt[:, 0] = -R_gt[:, 0]
        t_gt = rng.uniform(-0.4, 0.4, size=3)
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        if symmetric_axis_spin and j % 3 == 0:
            # pure spin about the symmetry axis: huge ADD, ~zero ADD-S
            R_pred = R_gt @ _rot_z(rng.uniform(0.5, np.pi))
            t_pred = t_gt + t_mags[j] * d * 0.1
        else:
            R_pred = _rot_axis(rng, rng.uniform(0.0, 25.0)) @ R_gt
            t_pred = t_gt + t_mags[j] * d
        pairs.append((np.concatenate([R_pred, t_pred[:, None]], 1),
                      np.concatenate([R_gt, t_gt[:, None]], 1)))
    return pairs


@pytest.fixture(scope="module")
def bop_setup():
    rng = np.random.default_rng(42)
    models = {
        "rev_sym": {"pts": _revolution_cloud(rng)},
        "blob_asym": {"pts": rng.uniform(-0.08, 0.08, size=(N_PTS, 3))},
    }
    # error-magnitude ladder spanning all thresholds, keeping a >=1e-3 margin
    # from 0.02 / 0.05 / 0.10 so an f32 wobble cannot flip a threshold count
    base = np.concatenate([
        np.linspace(5e-4, 0.017, 22), np.linspace(0.023, 0.047, 20),
        np.linspace(0.053, 0.097, 12), np.linspace(0.104, 0.18, 10),
    ])
    pairs = {
        "rev_sym": _pose_pairs(rng, len(base), base, symmetric_axis_spin=True),
        "blob_asym": _pose_pairs(rng, len(base), base),
    }
    return models, pairs


def test_adds_f32_vs_ckdtree_f64_at_bop_scale(bop_setup):
    from scipy.spatial import cKDTree

    models, pairs = bop_setup
    pts = models["rev_sym"]["pts"]
    pp = np.stack([p for p, _ in pairs["rev_sym"]])
    pg = np.stack([g for _, g in pairs["rev_sym"]])

    ours = adi_errors(pts.astype(np.float32), pp, pg)

    pts64 = pts.astype(np.float64)
    oracle = np.empty(len(pp))
    for i in range(len(pp)):
        pred = pts64 @ pp[i, :, :3].T + pp[i, :, 3]
        gt = pts64 @ pg[i, :, :3].T + pg[i, :, 3]
        # reference direction (calc_adi, pose_evaluator.py:735-736): tree on
        # the PREDICTED cloud, query every GT point
        dists, _ = cKDTree(pred).query(gt, k=1)
        oracle[i] = dists.mean()
    # 0.1 mm AUC grid step: f32 per-pose error must sit far inside one cell
    err = np.abs(ours - oracle)
    assert err.max() < 2e-5, err.max()
    # the axis-spin poses prove ties are exercised: the spin moves every
    # point far along its circle (large ADD) while the symmetric NN distance
    # stays near the translation offset — ADD-S typically >>5x smaller
    spin = [i for i in range(len(pp)) if i % 3 == 0]
    adds_spin = oracle[spin]
    add_all = add_errors(pts.astype(np.float32), pp, pg)
    ratio = add_all[spin] / np.maximum(adds_spin, 1e-6)
    assert np.median(ratio) > 5.0, np.median(ratio)


def test_add_f32_vs_f64_at_bop_scale(bop_setup):
    models, pairs = bop_setup
    pts = models["blob_asym"]["pts"]
    pp = np.stack([p for p, _ in pairs["blob_asym"]])
    pg = np.stack([g for _, g in pairs["blob_asym"]])
    ours = add_errors(pts.astype(np.float32), pp, pg)
    pts64 = pts.astype(np.float64)
    oracle = np.empty(len(pp))
    for i in range(len(pp)):
        pred = pts64 @ pp[i, :, :3].T + pp[i, :, 3]
        gt = pts64 @ pg[i, :, :3].T + pg[i, :, 3]
        oracle[i] = np.linalg.norm(pred - gt, axis=1).mean()
    assert np.abs(ours - oracle).max() < 2e-5


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not mounted")
def test_full_evaluator_auc_within_budget_at_bop_scale(bop_setup, tmp_path):
    """End-to-end: our evaluator's ADD(-S) JSON vs the reference's own
    evaluator at 15k points — AUC within 0.1 on the 0-100 scale (the 0.1%
    BASELINE.md budget), threshold counts exact."""
    from tests.test_evaluator_reference_parity import _load_ref

    models, pairs = bop_setup
    models_info = {c: {"diameter": DIAMETER_MM[c]} for c in CLASSES}

    ref_mod = _load_ref("ref_pose_evaluator_bop",
                        "evaluation_tools/pose_evaluator.py")
    ref_ev = ref_mod.PoseEvaluator(models, list(CLASSES), models_info, SYMMETRY)
    our_ev = PoseEvaluator(models, list(CLASSES), models_info, SYMMETRY,
                           diameter_relative=False)
    for ev in (ref_ev, our_ev):
        for c in CLASSES:
            for pred, gt in pairs[c]:
                ev.poses_pred[c].append(pred)
                ev.poses_gt[c].append(gt)
                ev.poses_img[c].append("img.png")
                ev.camera_intrinsics[c].append(None)
                ev.num[c] += 1

    def run(ev, root):
        out = os.path.join(str(tmp_path), root, "adds") + "/"
        os.makedirs(out, exist_ok=True)
        ev.evaluate_pose_adds(out)
        with open(os.path.join(out, "adds/adds.json")) as f:
            return json.load(f)

    ref_json = run(ref_ev, "ref")
    our_json = run(our_ev, "ours")
    for cls in CLASSES:
        o, r = our_json[cls], ref_json[cls]
        for key in ("0.02", "0.05", "0.10"):
            assert o["threshold"][key] == r["threshold"][key], (cls, key)
            np.testing.assert_allclose(o["accuracy"][key], r["accuracy"][key])
        np.testing.assert_allclose(
            o["accuracy"]["auc"], r["accuracy"]["auc"], atol=0.1,
            err_msg=f"{cls}: AUC exceeds the 0.1% parity budget")
    np.testing.assert_allclose(
        our_json["accuracy"]["auc"], ref_json["accuracy"]["auc"], atol=0.1)
