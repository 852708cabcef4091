"""End-to-end walkthrough: dataset -> train -> eval -> export -> stream.

A runnable tour of the framework on a generated synthetic dataset (no
downloads). Mirrors the path a reference (aau-cns/poet) user takes:
convert data, train with the CLI flags they know, evaluate ADD(-S), then
deploy — plus the TPU-native deployment steps the reference delegates to
TensorRT (portable StableHLO export, streaming server).

Run (CPU works; pass --mesh for a virtual 8-device data-parallel mesh):

    python examples/end_to_end.py [--epochs 10] [--mesh]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--mesh", action="store_true",
                    help="force a virtual 8-device CPU mesh (data parallel)")
    args = ap.parse_args()

    if args.mesh:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import jax

    if args.mesh:
        jax.config.update("jax_platforms", "cpu")

    # 1. a synthetic PoET-format dataset (pose = deterministic fn of the box,
    #    so a tiny model can actually learn it; see tests/helpers.py)
    from tests.helpers import make_synthetic_dataset

    data = tempfile.mkdtemp(prefix="poet_data_")
    out = tempfile.mkdtemp(prefix="poet_out_")
    make_synthetic_dataset(data, n_train=64, n_test=16, learnable=True)
    print(f"dataset: {data}\noutput:  {out}\ndevices: {jax.devices()}")

    # 2. train through the CLI surface (the flags a reference user knows)
    from poet_tpu.cli import args_to_config, get_args_parser, main as cli_main

    parser = argparse.ArgumentParser(parents=[get_args_parser()])
    base = ["--dataset_path", data, "--n_classes", "3",
            "--batch_size", "8", "--eval_batch_size", "8",
            "--enc_layers", "2", "--dec_layers", "2", "--hidden_dim", "64",
            "--nheads", "4", "--dim_feedforward", "128", "--num_queries", "5",
            "--num_workers", "2", "--dropout", "0.0",
            "--num_feature_levels", "4", "--lr", "1e-3",
            "--output_dir", out, "--epochs", str(args.epochs),
            "--eval_interval", str(args.epochs)]
    cli_main(args_to_config(parser.parse_args(base)))

    log = [json.loads(l) for l in
           open(os.path.join(out, "log.txt")).read().strip().splitlines()]
    print(f"\ntrain loss: {log[0]['train_loss']:.3f} (epoch 0) -> "
          f"{log[-1]['train_loss']:.3f} (epoch {log[-1]['epoch']})")
    eval_dir = os.path.join(out, f"eval_test_gt_{args.epochs - 1}")
    if os.path.isdir(eval_dir):
        adds = json.load(open(os.path.join(eval_dir, "adds", "adds.json")))
        print("ADD(-S) accuracy:", adds.get("accuracy"))

    # 3. portable deployment artifact (the TensorRT-engine equivalent):
    #    StableHLO + weights; reloads WITHOUT model code
    import numpy as np

    from poet_tpu.engine.checkpoint import load_checkpoint
    from poet_tpu.engine.serving import (ExportedPoseServer, PoseServer,
                                         export_model)
    from poet_tpu.config import PoETConfig

    cfg = PoETConfig()
    m = cfg.model
    m.hidden_dim, m.nheads, m.enc_layers, m.dec_layers = 64, 4, 2, 2
    m.dim_feedforward, m.num_queries, m.n_classes = 128, 5, 3
    m.dropout = 0.0
    payload, _ = load_checkpoint(os.path.join(out, "checkpoint"))
    params = payload["params"]

    H, W = 96, 128
    engine = export_model(cfg, params, os.path.join(out, "engine"),
                          batch_size=1, image_size=(H, W))
    server = ExportedPoseServer(engine)
    rng = np.random.default_rng(0)
    frame = rng.uniform(size=(1, H, W, 3)).astype(np.float32)
    boxes = np.asarray([[[0.5, 0.5, 0.3, 0.3]] * 5], np.float32)
    labels = np.ones((1, 5), np.int32)
    n_boxes = np.asarray([1], np.int32)
    res = server.infer(frame, boxes=boxes, labels=labels, n_boxes=n_boxes)
    print(f"\nexported engine: {engine}\n  translation[0,0] = "
          f"{res['translation'][0, 0]}")

    # 4. streaming server (tracker mode: the caller feeds boxes back in —
    #    in deployment this is the EKF predictor's job)
    live = PoseServer(cfg, params, batch_size=1, image_size=(H, W))
    frames = (rng.uniform(size=(1, H, W, 3)).astype(np.float32)
              for _ in range(5))
    n = 0
    for out_k in live.stream(frames, boxes_fn=lambda prev: (boxes, labels, n_boxes)):
        n += 1
    # one synchronous frame records latency stats (stream() uses the async path)
    live.infer(frame, boxes=boxes, labels=labels, n_boxes=n_boxes)
    print(f"streamed {n} frames; sync-frame latency: "
          f"{live.latency_stats().get('p50_ms', float('nan')):.1f} ms p50")


if __name__ == "__main__":
    main()
