"""Evaluator tests: error kernels vs scipy/cKDTree oracles + golden metrics."""

import json
import os

import numpy as np
import pytest
from scipy import spatial
from scipy.spatial.transform import Rotation as ScipyRot

from poet_tpu.evaluation.pose_evaluator import (
    PoseEvaluator,
    add_errors,
    adi_errors,
    rotation_errors_deg,
    translation_errors,
)
from poet_tpu.evaluation.ply import load_ply


def _random_poses(rng, n):
    R = ScipyRot.random(n, random_state=np.random.RandomState(7)).as_matrix()
    t = rng.normal(scale=0.5, size=(n, 3)) + np.array([0, 0, 1.0])
    return np.concatenate([R, t[:, :, None]], axis=2)


def _pts(rng, n=400):
    return rng.normal(scale=0.05, size=(n, 3))


def test_add_matches_definition(rng):
    pts = _pts(rng)
    pred = _random_poses(rng, 6)
    gt = _random_poses(rng, 6)
    out = add_errors(pts, pred, gt)
    for i in range(6):
        est = pts @ pred[i, :, :3].T + pred[i, :, 3]
        g = pts @ gt[i, :, :3].T + gt[i, :, 3]
        expected = np.linalg.norm(est - g, axis=1).mean()
        np.testing.assert_allclose(out[i], expected, rtol=1e-9)


def test_adi_matches_ckdtree(rng):
    """Brute-force device NN must equal the reference's cKDTree NN."""
    pts = _pts(rng, 300)
    pred = _random_poses(rng, 5)
    gt = pred.copy()
    gt[:, :, 3] += rng.normal(scale=0.01, size=(5, 3))
    out = adi_errors(pts, pred, gt)
    for i in range(5):
        est = pts @ pred[i, :, :3].T + pred[i, :, 3]
        g = pts @ gt[i, :, :3].T + gt[i, :, 3]
        tree = spatial.cKDTree(est)
        nn, _ = tree.query(g, k=1)
        np.testing.assert_allclose(out[i], nn.mean(), rtol=1e-3, atol=1e-5)


def test_rotation_error_vs_logm(rng):
    """Closed-form trace formula vs scipy logm Frobenius (reference helper)."""
    from scipy.linalg import logm

    pred = _random_poses(rng, 10)
    gt = _random_poses(rng, 10)
    out = rotation_errors_deg(pred, gt)
    for i in range(10):
        temp = logm(pred[i, :, :3].T @ gt[i, :, :3])
        expected = np.linalg.norm(temp, "fro") / np.sqrt(2) / np.pi * 180
        np.testing.assert_allclose(out[i], expected, atol=1e-4)


def test_translation_error(rng):
    pred = _random_poses(rng, 4)
    gt = _random_poses(rng, 4)
    out = translation_errors(pred, gt)
    expected = np.linalg.norm(pred[:, :, 3] - gt[:, :, 3], axis=1)
    np.testing.assert_allclose(out, expected)


@pytest.fixture
def evaluator(rng):
    classes = ["obj_a", "obj_b"]
    models = {c: {"pts": _pts(rng, 200)} for c in classes}
    models_info = {c: {"diameter": 120.0} for c in classes}  # mm
    symmetry = {"obj_a": False, "obj_b": True}
    return PoseEvaluator(models, classes, models_info, symmetry)


def test_evaluator_perfect_poses(evaluator, rng, tmp_path):
    """Identical pred/gt poses -> 100% at every threshold, AUC ~100."""
    poses = _random_poses(rng, 8)
    for i in range(8):
        evaluator.record(1 + (i % 2), poses[i, :, :3], poses[i, :, 3],
                         poses[i, :, :3], poses[i, :, 3])
    out = str(tmp_path) + "/"
    res = evaluator.evaluate_pose_adds(out)
    assert res["accuracy"]["0.02"] == 100.0
    assert res["accuracy"]["auc"] > 99.0
    assert os.path.exists(out + "adds/adds.log")
    loaded = json.load(open(out + "adds/adds.json"))
    assert loaded["accuracy"]["0.10"] == 100.0


def test_evaluator_threshold_behavior(evaluator, rng, tmp_path):
    """3 cm translation offset: fails 2 cm, passes 5/10 cm (asymmetric obj)."""
    pose = _random_poses(rng, 1)[0]
    off = pose.copy()
    off[:, 3] += np.array([0.03, 0, 0])
    evaluator.record(1, off[:, :3], off[:, 3], pose[:, :3], pose[:, 3])
    res = evaluator.evaluate_pose_add(str(tmp_path) + "/")
    assert res["obj_a"]["accuracy"]["0.02"] == 0.0
    assert res["obj_a"]["accuracy"]["0.05"] == 100.0


def test_evaluator_diameter_relative(rng, tmp_path):
    """LM-O mode: thresholds scale with model diameter."""
    classes = ["obj_a"]
    models = {"obj_a": {"pts": _pts(rng, 100)}}
    models_info = {"obj_a": {"diameter": 200.0}}  # mm -> 0.2 m
    evalr = PoseEvaluator(models, classes, models_info, {"obj_a": False},
                          diameter_relative=True)
    pose = _random_poses(rng, 1)[0]
    off = pose.copy()
    off[:, 3] += np.array([0.015, 0, 0])  # 1.5 cm error
    evalr.record(1, off[:, :3], off[:, 3], pose[:, :3], pose[:, 3])
    res = evalr.evaluate_pose_add(str(tmp_path) + "/")
    # thresholds: 0.004 / 0.01 / 0.02 m -> error 0.015 only passes 0.10d
    assert res["obj_a"]["accuracy"]["0.02"] == 0.0
    assert res["obj_a"]["accuracy"]["0.05"] == 0.0
    assert res["obj_a"]["accuracy"]["0.10"] == 100.0


def test_avg_errors(evaluator, rng, tmp_path):
    pose = _random_poses(rng, 1)[0]
    off = pose.copy()
    off[:, 3] += np.array([0.0, 0.04, 0])
    evaluator.record(1, off[:, :3], off[:, 3], pose[:, :3], pose[:, 3])
    t_res = evaluator.calculate_class_avg_translation_error(str(tmp_path) + "/")
    np.testing.assert_allclose(t_res["obj_a"], 0.04, atol=1e-9)
    r_res = evaluator.calculate_class_avg_rotation_error(str(tmp_path) + "/")
    np.testing.assert_allclose(r_res["obj_a"], 0.0, atol=1e-3)


def test_adi_bucket_padding_no_recompile(rng):
    """Clouds in the same size bucket share ONE compiled program.

    adi_errors pads clouds to _PTS_BUCKET multiples and jits at module level;
    per-class closures used to recompile for every class of every metric pass
    (seconds each through a remote-relay TPU). Padded points must not change
    the values (cKDTree oracle).
    """
    from poet_tpu.evaluation import pose_evaluator as pe

    # _cache_size() counts compiled entries for the underlying function
    # across the whole process, so measure the delta, not the absolute
    base = pe._jitted("einsum", pe._adi_chunk_einsum)._cache_size()
    pred = _random_poses(rng, 3)
    gt = pred.copy()
    gt[:, :, 3] += rng.normal(scale=0.02, size=(3, 3))
    for n in (130, 200, 255):  # all pad to 256
        pts = _pts(rng, n)
        out = adi_errors(pts, pred, gt)
        est = pts @ pred[0, :, :3].T + pred[0, :, 3]
        g = pts @ gt[0, :, :3].T + gt[0, :, 3]
        nn, _ = spatial.cKDTree(est).query(g, k=1)
        np.testing.assert_allclose(out[0], nn.mean(), rtol=1e-3, atol=1e-5)
    assert pe._JITTED["einsum"]._cache_size() <= base + 1


def test_error_cache_invalidation(evaluator, rng, tmp_path):
    """_class_errors is memoized across metric passes; record() invalidates.

    ADD and ADD(-S) share per-class error vectors — cached results must stay
    identical to fresh computation, and new pose pairs must appear in later
    passes.
    """
    poses = _random_poses(rng, 4)
    for i in range(4):
        evaluator.record(1, poses[i, :, :3], poses[i, :, 3],
                         poses[i, :, :3], poses[i, :, 3])
    out = str(tmp_path) + "/"
    first = evaluator.evaluate_pose_add(out)
    assert ("obj_a", "add") in evaluator._err_cache
    # second pass served from cache, identical result
    assert evaluator.evaluate_pose_add(out) == first
    # a new (bad) pose invalidates the class cache and changes the metric
    bad = poses[0].copy()
    bad[:, 3] += 1.0
    evaluator.record(1, bad[:, :3], bad[:, 3], poses[0, :, :3], poses[0, :, 3])
    assert ("obj_a", "add") not in evaluator._err_cache
    res = evaluator.evaluate_pose_add(out)
    assert res["obj_a"]["accuracy"]["0.10"] == pytest.approx(100.0 * 4 / 5)
    # reset clears everything
    evaluator.reset()
    assert evaluator._err_cache == {}


def test_ply_roundtrip_ascii(tmp_path, rng):
    pts = rng.normal(size=(10, 3))
    faces = [[0, 1, 2], [3, 4, 5]]
    p = tmp_path / "test.ply"
    with open(p, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for q in pts:
            f.write(f"{q[0]} {q[1]} {q[2]}\n")
        for face in faces:
            f.write("3 " + " ".join(map(str, face)) + "\n")
    out = load_ply(str(p))
    np.testing.assert_allclose(out["pts"], pts, rtol=1e-6)
    np.testing.assert_array_equal(out["faces"], faces)


def test_ply_binary(tmp_path, rng):
    import struct

    pts = rng.normal(size=(5, 3)).astype(np.float32)
    p = tmp_path / "bin.ply"
    with open(p, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(b"element vertex 5\n")
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"end_header\n")
        for q in pts:
            f.write(struct.pack("<fff", *q))
    out = load_ply(str(p))
    np.testing.assert_allclose(out["pts"], pts, rtol=1e-6)


def test_evaluator_class_order_stable_across_epochs(rng, tmp_path):
    """cls_idx -> name is positional (classes.json order); running a metric
    pass must NOT re-sort self.classes in place (regression: the second
    epoch's record() attributed poses to the wrong class whenever the class
    list was not already alphabetical)."""
    classes = ["obj_z", "obj_a"]          # deliberately non-alphabetical
    models = {c: {"pts": _pts(rng, 100)} for c in classes}
    models_info = {c: {"diameter": 120.0} for c in classes}
    ev = PoseEvaluator(models, classes, models_info,
                       {c: False for c in classes})

    def one_pose():
        R = np.eye(3)
        t = np.zeros(3)
        ev.record(1, R, t, R, t)          # cls_idx 1 -> classes[0] = obj_z

    one_pose()
    ev.evaluate_pose_add(str(tmp_path) + "/e0/")
    assert ev.classes == classes          # untouched by the metric pass
    one_pose()                            # epoch 2: must still hit obj_z
    assert ev.num["obj_z"] == 2.0 and ev.num["obj_a"] == 0.0


def test_ply_truncated_header_raises(tmp_path):
    """EOF before end_header must raise, not spin forever (regression: the
    'empty line -> continue' branch retried b'' from readline() infinitely)."""
    p = tmp_path / "trunc.ply"
    p.write_bytes(b"ply\nformat ascii 1.0\nelement vertex 1\n")
    with pytest.raises(ValueError, match="end_header"):
        load_ply(str(p))


def test_ply_non_triangular_faces_raise(tmp_path):
    """Quad faces must raise (BOP-toolkit/reference behavior), not silently
    truncate to the first three vertices."""
    p = tmp_path / "quad.ply"
    p.write_text(
        "ply\nformat ascii 1.0\n"
        "element vertex 4\nproperty float x\nproperty float y\nproperty float z\n"
        "element face 1\nproperty list uchar int vertex_indices\nend_header\n"
        "0 0 0\n1 0 0\n1 1 0\n0 1 0\n"
        "4 0 1 2 3\n"
    )
    with pytest.raises(ValueError, match="triangular"):
        load_ply(str(p))


def test_reprojection_error(rng):
    from poet_tpu.evaluation.pose_evaluator import project_pts, reprojection_errors, se3_mul

    pts = _pts(rng, 50)
    pose = _random_poses(rng, 1)[0]
    K = np.array([500.0, 0, 320, 0, 500, 240, 0, 0, 1])
    # identical poses -> zero error
    err = reprojection_errors(pts, pose[None], pose[None], K[None])
    np.testing.assert_allclose(err, 0.0, atol=1e-9)
    # shifted along camera x by dz*z... simple: shift x by 0.01 at z~1 -> ~5 px
    off = pose.copy()
    off[0, 3] += 0.01
    err = reprojection_errors(pts, off[None], pose[None], K[None])
    assert 2.0 < err[0] < 10.0
    # se3_mul identity
    eye = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    np.testing.assert_allclose(se3_mul(eye, pose), pose, atol=1e-12)


def test_quat_error():
    import jax.numpy as jnp
    from poet_tpu.utils.quaternions import quat_error

    q1 = jnp.asarray([[np.cos(0.25), np.sin(0.25), 0, 0]])  # 0.5 rad about x
    q2 = jnp.asarray([[1.0, 0, 0, 0]])
    np.testing.assert_allclose(np.asarray(quat_error(q1, q2)), 0.5, atol=1e-5)


class TestMultiHostEvalGather:
    """pose_evaluate gathers matched pairs across process-sharded eval
    loaders (the reference would silently score 1/N of the data per rank)."""

    def _pairs(self, rng, n, with_intr=True):
        import numpy as np

        out = []
        for i in range(n):
            out.append(dict(
                cls=int(rng.integers(1, 5)),
                # include ids above 2^24 (f32 integer precision): the gather
                # must carry ids integrally, not through float32
                image_id=i + 16_777_220,
                pred_rotation=rng.normal(size=(3, 3)).astype(np.float32),
                pred_translation=rng.normal(size=(3,)).astype(np.float32),
                tgt_rotation=rng.normal(size=(3, 3)).astype(np.float32),
                tgt_translation=rng.normal(size=(3,)).astype(np.float32),
                # real pairs carry the flat (9,) vector from the padded
                # targets (structures.py intrinsics (B, Q, 9))
                intrinsics=rng.normal(size=(9,)).astype(np.float32)
                if with_intr else None,
            ))
        return out

    def test_pack_unpack_roundtrip(self, rng):
        from poet_tpu.engine.evaluate import pack_pairs, unpack_pairs

        pairs = self._pairs(rng, 5)
        back = unpack_pairs(pack_pairs(pairs, pad_to=9))
        assert len(back) == 5
        for a, b in zip(pairs, back):
            assert a["cls"] == b["cls"] and a["image_id"] == b["image_id"]
            np.testing.assert_allclose(a["pred_rotation"], b["pred_rotation"])
            np.testing.assert_allclose(a["intrinsics"], b["intrinsics"])

    def test_simulated_two_process_merge(self, rng):
        """Pad-to-max + stack (what process_allgather produces) + per-process
        unpack must reproduce the unsharded pair set exactly."""
        from poet_tpu.engine.evaluate import pack_pairs, unpack_pairs

        pairs = self._pairs(rng, 7, with_intr=False)
        shards = [pairs[0::2], pairs[1::2]]             # process-sharded halves
        pad_to = max(len(s) for s in shards)
        packed = [pack_pairs(s, pad_to) for s in shards]
        gathered = {k: np.stack([p[k] for p in packed]) for k in packed[0]}
        merged = []
        for p in range(2):
            merged.extend(unpack_pairs({k: v[p] for k, v in gathered.items()}))
        assert len(merged) == len(pairs)
        got = sorted(merged, key=lambda d: d["image_id"])
        for a, b in zip(pairs, got):
            assert a["image_id"] == b["image_id"] and a["cls"] == b["cls"]
            np.testing.assert_allclose(a["tgt_translation"], b["tgt_translation"])
            assert b["intrinsics"] is None

    def test_single_process_identity(self, rng):
        from poet_tpu.engine.evaluate import gather_pairs_across_hosts

        pairs = self._pairs(rng, 3)
        assert gather_pairs_across_hosts(pairs) is pairs


def test_parse_scene_img():
    """BOP path parsing matches the reference's positional parse
    (engine.py:229-230) and degrades gracefully."""
    from poet_tpu.engine.evaluate import parse_scene_img

    assert parse_scene_img("test/000048/rgb/000123.png") == (48, 123)
    assert parse_scene_img("train_pbr/000001/rgb/1.jpg") == (1, 1)
    assert parse_scene_img("000002/rgb/000007.png") == (2, 7)  # no split prefix
    assert parse_scene_img("weird.png") == (0, 0)
    assert parse_scene_img("") == (0, 0)


# ---------------------------------------------------------------------------
# Shipped dataset_files assets + asset-path fallback resolution
# ---------------------------------------------------------------------------

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_ascii_ply(path, pts):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("end_header\n")
        for q in pts:
            f.write(f"{q[0]} {q[1]} {q[2]}\n")


@pytest.mark.parametrize("dataset,n_classes", [("ycbv", 21), ("lmo", 8)])
def test_shipped_dataset_files(dataset, n_classes):
    """dataset_files/*.json ship the class map + symmetry flags for eval."""
    import json

    with open(os.path.join(REPO_ROOT, "dataset_files", f"{dataset}_classes.json")) as f:
        classes = json.load(f)
    with open(os.path.join(REPO_ROOT, "dataset_files", f"{dataset}_symmetries.json")) as f:
        sym = json.load(f)
    assert len(classes) == n_classes
    # every class has a symmetry flag, keys are numeric-string BOP object ids
    assert set(sym) == set(classes.values())
    assert all(isinstance(v, bool) for v in sym.values())
    assert all(k == str(int(k)) for k in classes)
    # factual spot checks (BOP symmetric-object sets)
    if dataset == "ycbv":
        assert sym["024_bowl"] and sym["061_foam_brick"]
        assert not sym["025_mug"]
    else:
        assert sym["eggbox"] and sym["glue"] and not sym["ape"]


def test_build_pose_evaluator_shipped_fallback(tmp_path, rng):
    """build_pose_evaluator falls back to the in-repo dataset_files when the
    reference-style dataset_path-relative JSONs are absent."""
    import json

    from poet_tpu.config import PoETConfig
    from poet_tpu.evaluation import build_pose_evaluator

    models_dir = tmp_path / "models_eval"
    models_dir.mkdir()
    with open(os.path.join(REPO_ROOT, "dataset_files", "lmo_classes.json")) as f:
        classes = json.load(f)
    info = {}
    for cls_id in classes:
        _write_ascii_ply(models_dir / f"obj_{int(cls_id):06d}.ply",
                         rng.normal(size=(16, 3)) * 50)
        info[cls_id] = {"diameter": 150.0}
    with open(models_dir / "models_info.json", "w") as f:
        json.dump(info, f)

    cfg = PoETConfig()
    cfg.data.dataset = "lmo"
    cfg.data.dataset_path = str(tmp_path)          # no /annotations inside
    cfg.eval.models_path = "/models_eval/"
    ev = build_pose_evaluator(cfg)
    assert ev.diameter_relative
    assert set(ev.classes) == set(classes.values())
    assert ev.model_symmetry["eggbox"] and not ev.model_symmetry["cat"]
