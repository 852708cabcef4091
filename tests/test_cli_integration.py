"""Full CLI integration: train -> checkpoint -> eval/BOP/inference/resume.

Drives `poet_tpu.cli.main` on a generated PoET-format dataset through the
public flag surface — the same path a reference user takes.
"""

import json
import os
import sys

import numpy as np
import pytest

from tests.helpers import make_synthetic_dataset


def _run_cli(argv):
    from poet_tpu.cli import args_to_config, get_args_parser, main
    import argparse

    parser = argparse.ArgumentParser(parents=[get_args_parser()])
    args = parser.parse_args(argv)
    cfg = args_to_config(args)
    if cfg.runtime.inference:
        cfg.model.bbox_mode = "backbone"
    return main(cfg)


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    data = make_synthetic_dataset(str(tmp_path_factory.mktemp("data")))
    out = str(tmp_path_factory.mktemp("out"))
    return data, out


BASE = ["--n_classes", "3", "--batch_size", "4", "--eval_batch_size", "4",
        "--enc_layers", "1", "--dec_layers", "1", "--hidden_dim", "32",
        "--nheads", "2", "--dim_feedforward", "64", "--num_queries", "4",
        "--num_workers", "2", "--dropout", "0.0", "--num_feature_levels", "4"]


def test_cli_train_then_eval_then_bop(workspace):
    data, out = workspace
    _run_cli(["--dataset_path", data, "--output_dir", out, "--epochs", "1",
              "--eval_interval", "5", "--save_interval", "50"] + BASE)
    assert os.path.isdir(os.path.join(out, "checkpoint"))
    assert os.path.exists(os.path.join(out, "log.txt"))
    # final eval wrote the metric tree
    eval_dir = os.path.join(out, "eval_test_gt")
    for metric in ("add", "adi", "adds", "avg_t_error", "avg_rot_error"):
        assert os.path.isdir(os.path.join(eval_dir, metric)), metric
    adds = json.load(open(os.path.join(eval_dir, "adds", "adds.json")))
    assert "accuracy" in adds

    # the lr meter is live (VERDICT r1 item 8) and reflects the base lr
    log_lines = open(os.path.join(out, "log.txt")).read().strip().splitlines()
    assert json.loads(log_lines[0])["train_lr"] == pytest.approx(2e-4)

    # resume continues at epoch 1; --lr_drop 2 drops the logged lr 10x there
    _run_cli(["--dataset_path", data, "--output_dir", out, "--epochs", "3",
              "--eval_interval", "5", "--save_interval", "50", "--lr_drop", "2",
              "--resume", os.path.join(out, "checkpoint")] + BASE)
    log_lines = open(os.path.join(out, "log.txt")).read().strip().splitlines()
    by_epoch = {json.loads(l)["epoch"]: json.loads(l) for l in log_lines}
    assert 1 in by_epoch and 2 in by_epoch
    assert by_epoch[1]["train_lr"] == pytest.approx(2e-4)
    assert by_epoch[2]["train_lr"] == pytest.approx(2e-5)

    # BOP export
    _run_cli(["--dataset_path", data, "--output_dir", out, "--eval_bop",
              "--resume", os.path.join(out, "checkpoint")] + BASE)
    csv_path = os.path.join(out, "bop_gt", "ycbv.csv")
    lines = open(csv_path).read().splitlines()
    assert lines[0] == "scene_id,im_id,obj_id,score,R,t,time"
    assert len(lines) > 1
    # strict BOP schema on every row: ids from the real file paths
    # ("000001/rgb/00000N.png" -> scene 1), score 1.0 in gt mode, R a valid
    # 9-float rotation, t 3 floats (mm), time a float
    seen_img_ids = set()
    for line in lines[1:]:
        row = line.split(",")
        assert len(row) == 7
        assert int(row[0]) == 1                       # scene id
        seen_img_ids.add(int(row[1]))
        assert 1 <= int(row[2]) <= 3                  # obj id in label range
        assert float(row[3]) == 1.0                   # gt-mode score parity
        R = np.asarray([float(x) for x in row[4].split()]).reshape(3, 3)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
        assert len(row[5].split()) == 3
        float(row[6])
    assert len(seen_img_ids) > 1                      # multiple images exported


def test_cli_export_model(workspace, tmp_path):
    """--export_model writes a portable artifact the ExportedPoseServer runs
    without model code (the CLI front door of engine/serving.export_model)."""
    data, out = workspace
    engine_dir = str(tmp_path / "engine")
    ret = _run_cli(["--dataset_path", data, "--output_dir", out,
                    "--export_model", engine_dir,
                    "--export_batch_size", "2",
                    "--export_image_size", "48", "64",
                    "--export_platforms", "cpu"] + BASE)
    assert ret == engine_dir
    assert os.path.exists(os.path.join(engine_dir, "module.bin"))

    from poet_tpu.engine.serving import ExportedPoseServer

    server = ExportedPoseServer(engine_dir)
    assert server.meta["batch_size"] == 2
    images = np.random.default_rng(0).uniform(size=(2, 48, 64, 3)).astype(np.float32)
    boxes = np.tile(np.asarray([[0.5, 0.5, 0.3, 0.3]], np.float32), (2, 4, 1))
    res = server.infer(images, boxes=boxes)
    assert np.isfinite(res["translation"]).all()
    assert res["translation"].shape[0] == 2


def test_cli_xla_cache_dir(workspace, tmp_path):
    """--xla_cache_dir populates a persistent XLA compilation cache, so a
    restart (or preemption resume) skips the train-step recompile."""
    import jax

    data, _ = workspace
    cache = str(tmp_path / "xla_cache")
    try:
        _run_cli(["--dataset_path", data, "--output_dir", str(tmp_path / "out"),
                  "--epochs", "1", "--eval_interval", "5", "--save_interval",
                  "50", "--xla_cache_dir", cache] + BASE)
        assert os.path.isdir(cache) and len(os.listdir(cache)) > 0
    finally:
        # don't leak the global cache config into later tests
        jax.config.update("jax_compilation_cache_dir", None)


def test_cli_inference(workspace):
    data, out = workspace
    infer_out = os.path.join(out, "infer")
    _run_cli(["--dataset_path", data, "--output_dir", out, "--inference",
              "--inference_path", os.path.join(data, "test_all/000001/rgb"),
              "--inference_output", infer_out, "--backbone_conf_thresh", "0.2",
              "--resume", os.path.join(out, "checkpoint")] + BASE)
    results = json.load(open(os.path.join(infer_out, "results.json")))
    assert len(results) == 4  # test images
    for dets in results.values():
        for d in dets.values():
            assert set(d) == {"t", "rot", "box", "class"}
            assert np.asarray(d["rot"]).shape == (3, 3)


def test_sigterm_checkpoints_and_exits_cleanly(workspace, tmp_path):
    """Preemption safety (extension; the reference has none, SURVEY §5):
    SIGTERM mid-training writes the rolling checkpoint and exits 0; --resume
    then restarts the interrupted epoch."""
    import signal
    import subprocess
    import time as _time

    data, _ = workspace
    out = str(tmp_path / "preempt_out")
    script = (
        "import sys, argparse; sys.argv=['x']; "
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "from poet_tpu.cli import args_to_config, get_args_parser, main; "
        "p = argparse.ArgumentParser(parents=[get_args_parser()]); "
        f"a = p.parse_args({['--dataset_path', data, '--output_dir', out, '--epochs', '50', '--eval_interval', '100', '--save_interval', '100'] + BASE!r}); "
        "main(args_to_config(a))"
    )
    # The subprocess must NOT inherit a TPU-plugin site dir (PYTHONPATH):
    # plugin registration dials the device tunnel at interpreter startup,
    # which hangs the whole test when the remote worker is down — and this
    # CPU-only subprocess never needs it. The env var JAX_PLATFORMS=cpu
    # alone is not reliable under such plugins (see tests/conftest.py), so
    # the script also forces the platform before any jax use.
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p) or "."
    proc = subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env,
    )
    # wait for training to actually start stepping, then preempt
    deadline = _time.time() + 600
    started = False
    lines = []
    while _time.time() < deadline:
        line = proc.stdout.readline()
        if not line:
            break
        lines.append(line)
        if "Epoch: [0]" in line and not started:
            started = True
            _time.sleep(3)          # let a step or two land
            proc.send_signal(signal.SIGTERM)
        if "preempted at" in line:
            break
    assert started, "".join(lines[-20:])
    rc = proc.wait(timeout=600)
    rest = proc.stdout.read()
    output = "".join(lines) + rest
    assert "preempted at" in output, output[-2000:]
    assert rc == 0, (rc, output[-2000:])
    assert os.path.isdir(os.path.join(out, "checkpoint")), os.listdir(out)

    # resume restarts the interrupted epoch (payload epoch = epoch-1)
    import re

    m = re.search(r"preempted at epoch (\d+)", output)
    interrupted = int(m.group(1))
    from poet_tpu.engine.checkpoint import load_checkpoint
    _, start_epoch = load_checkpoint(os.path.join(out, "checkpoint"))
    assert start_epoch == interrupted, (start_epoch, interrupted)
