"""BOP dress rehearsal (VERDICT r2 #6): scripts/repro_bop.sh end-to-end.

A synthetic BOP-layout directory (scene dirs with scene_gt/gt_info/camera
JSONs, models_eval PLYs) plus a reference-shaped model-zoo .pth must produce
a BOP CSV through ONE command — the exact flow a user runs on real YCB-V
data, so the BASELINE.md 0.1% ADD(-S) contract is zero-debugging when the
dataset exists.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.helpers import make_synthetic_bop_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_repro_bop_script_end_to_end(tmp_path):
    torch = pytest.importorskip("torch")
    from tests.test_torch_import import _fake_poet_state_dict

    bop = make_synthetic_bop_dataset(str(tmp_path / "bop"), n_imgs=3)

    # reference-shaped zoo checkpoint (gt-mode eval: PoET tree only)
    sd = _fake_poet_state_dict(C=64, heads=4, enc=2, dec=2, n_out=4)
    ckpt = tmp_path / "zoo.pth"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()},
                "epoch": 49}, str(ckpt))

    work = tmp_path / "work"
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                  if p and "axon" not in p])
    cmd = [
        "bash", os.path.join(REPO, "scripts", "repro_bop.sh"),
        bop, str(ckpt), str(work), "ycbv", "test", "--",
        "--n_classes", "3", "--hidden_dim", "64", "--nheads", "4",
        "--enc_layers", "2", "--dec_layers", "2", "--dim_feedforward", "128",
        "--num_queries", "4", "--num_workers", "0", "--eval_batch_size", "2",
        "--num_feature_levels", "4",
    ]
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                          timeout=1800)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    # converted annotations exist and carry BOP-derived fields
    ann = json.load(open(work / "annotations" / "test.json"))
    assert len(ann["images"]) == 3
    assert all("intrinsics" in im for im in ann["images"])
    # translations were scaled mm -> m by the converter
    t = np.asarray([a["relative_pose"]["position"] for a in ann["annotations"]])
    assert np.all(np.abs(t) < 10.0)

    # the CSV: strict BOP schema, scene/img ids parsed from the BOP paths
    csv = work / "run" / "bop_gt" / "ycbv.csv"
    lines = open(csv).read().splitlines()
    assert lines[0] == "scene_id,im_id,obj_id,score,R,t,time"
    assert len(lines) > 1
    for line in lines[1:]:
        scene_id, im_id, obj_id, score, R, t_, time_ = line.split(",")
        assert int(scene_id) == 1
        assert 0 <= int(im_id) < 3
        assert int(obj_id) in (1, 2, 3)
        R = np.fromstring(R, sep=" ")
        assert R.shape == (9,) and np.isfinite(R).all()
        assert np.fromstring(t_, sep=" ").shape == (3,)
        float(score), float(time_)
