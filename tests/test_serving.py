"""AOT serving path: compile once, fixed shapes, latency stats."""

import numpy as np
import pytest

import jax

from poet_tpu.engine.serving import PoseServer
from tests.test_model import make_batch, tiny_config


def test_tracker_mode_server(rng):
    cfg = tiny_config()
    from poet_tpu.models import build_model

    model = build_model(cfg)
    images, pad_mask, targets = make_batch(rng, B=2, H=64, W=64)
    params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)

    server = PoseServer(cfg, params, batch_size=2, image_size=(64, 64))
    out = server.infer(
        np.asarray(images), boxes=np.asarray(targets["boxes"]),
        labels=np.asarray(targets["labels"]), n_boxes=np.asarray(targets["n_boxes"]),
    )
    assert out["translation"].shape == (2, 5, 3)
    assert out["rotation"].shape == (2, 5, 3, 3)
    assert np.isfinite(out["translation"]).all()
    # second frame reuses the compiled executable
    out2 = server.infer(
        np.asarray(images) * 0.5, boxes=np.asarray(targets["boxes"]),
        labels=np.asarray(targets["labels"]), n_boxes=np.asarray(targets["n_boxes"]),
    )
    stats = server.latency_stats()
    assert stats["frames"] == 2 and stats["p50_ms"] > 0


def test_data_parallel_server_matches_single(rng):
    """PoseServer(mesh=...): batch sharded over 'data', identical results.

    One server object serving N local chips (extension over the reference's
    single-GPU TensorRT deployment)."""
    from poet_tpu.models import build_model
    from poet_tpu.parallel.mesh import create_mesh

    cfg = tiny_config()
    model = build_model(cfg)
    images, pad_mask, targets = make_batch(rng, B=8, H=64, W=64)
    params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)

    kw = dict(
        boxes=np.asarray(targets["boxes"]), labels=np.asarray(targets["labels"]),
        n_boxes=np.asarray(targets["n_boxes"]),
    )
    single = PoseServer(cfg, params, batch_size=8, image_size=(64, 64))
    ref = single.infer(np.asarray(images), **kw)

    mesh = create_mesh()
    assert mesh.shape["data"] == 8
    server = PoseServer(cfg, params, batch_size=8, image_size=(64, 64), mesh=mesh)
    # inputs really shard: 8 single-example shards
    assert len(server._put(np.asarray(images)).addressable_shards) == 8
    out = server.infer(np.asarray(images), **kw)
    for k in ref:
        np.testing.assert_allclose(out[k], ref[k], atol=1e-5, rtol=1e-5,
                                   err_msg=k)
    # streaming works sharded too (tracker mode is the serial branch)
    got = list(server.stream(
        [np.asarray(images)],
        boxes_fn=lambda prev: (kw["boxes"], kw["labels"], kw["n_boxes"])))
    np.testing.assert_allclose(got[0]["translation"], ref["translation"],
                               atol=1e-5, rtol=1e-5)


def test_detector_mode_server_aleatoric(rng):
    cfg = tiny_config(bbox_mode="backbone", aleatoric=True)
    cfg.backbone.max_detections = 8
    from poet_tpu.models import build_model

    model = build_model(cfg)
    images, pad_mask, targets = make_batch(rng, B=1, H=64, W=64)
    params = model.init(jax.random.PRNGKey(0), images[:1], pad_mask[:1], targets)

    server = PoseServer(cfg, params, batch_size=1, image_size=(64, 64))
    out = server.infer(np.asarray(images[:1]))
    assert out["translation"].shape == (1, 5, 3)
    assert "translation_var" in out and (out["translation_var"] > 0).all()

    # detector-mode stream(): pipelined branch, one result per frame, equal
    # to the synchronous path
    frames = [np.asarray(images[:1]) * s for s in (1.0, 0.9, 0.8)]
    streamed = list(server.stream(frames))
    assert len(streamed) == 3
    for frame, got in zip(frames, streamed):
        ref = server.infer(frame)
        np.testing.assert_allclose(got["translation"], ref["translation"],
                                   atol=1e-6)


def test_export_roundtrip(rng, tmp_path):
    """export_model artifact reloads (deserialize path) and matches the live
    model's outputs (up to recompilation fusion order); no model code
    consulted at load time."""
    from poet_tpu.engine.serving import ExportedPoseServer, export_model
    from poet_tpu.models import build_model

    cfg = tiny_config()
    model = build_model(cfg)
    images, pad_mask, targets = make_batch(rng, B=2, H=64, W=64)
    params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)

    path = export_model(cfg, params, str(tmp_path / "engine"), batch_size=2,
                        image_size=(64, 64), platforms=("cpu",))
    import os
    assert os.path.exists(os.path.join(path, "module.bin"))

    server = ExportedPoseServer(path)
    out = server.infer(np.asarray(images), boxes=np.asarray(targets["boxes"]),
                       labels=np.asarray(targets["labels"]),
                       n_boxes=np.asarray(targets["n_boxes"]))
    ref = model.apply(params, images, pad_mask, targets, deterministic=True)
    np.testing.assert_allclose(out["translation"],
                               np.asarray(ref["translations"][-1]), atol=1e-5)
    np.testing.assert_allclose(out["rotation"],
                               np.asarray(ref["rotations"][-1]), atol=1e-5)

    # serving-API parity with the live PoseServer: stream + latency stats
    streamed = list(server.stream(
        [np.asarray(images)] * 2,
        boxes_fn=lambda prev: (np.asarray(targets["boxes"]),
                               np.asarray(targets["labels"]),
                               np.asarray(targets["n_boxes"]))))
    assert len(streamed) == 2
    np.testing.assert_allclose(streamed[0]["translation"], out["translation"],
                               atol=1e-6)
    assert server.latency_stats()["frames"] == 1  # stream() bypasses infer()


def test_streaming_pipeline(rng):
    """stream() yields one result per frame, matching synchronous infer, with
    tracker-mode boxes fed back by the caller (EKF-predictor pattern)."""
    from poet_tpu.engine.serving import PoseServer
    from poet_tpu.models import build_model

    cfg = tiny_config()
    model = build_model(cfg)
    images, pad_mask, targets = make_batch(rng, B=2, H=64, W=64)
    params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)
    server = PoseServer(cfg, params, batch_size=2, image_size=(64, 64))

    frames = [np.asarray(images) * s for s in (1.0, 0.9, 0.8)]
    b = np.asarray(targets["boxes"])
    l = np.asarray(targets["labels"])
    n = np.asarray(targets["n_boxes"])
    calls = []

    def boxes_fn(prev_host):
        calls.append(prev_host is not None)
        return b, l, n

    streamed = list(server.stream(frames, boxes_fn=boxes_fn))
    assert len(streamed) == len(frames)
    # first call sees no previous result; later calls do (pipeline feedback)
    assert calls == [False, True, True]
    for frame, out in zip(frames, streamed):
        ref = server.infer(frame, boxes=b, labels=l, n_boxes=n)
        np.testing.assert_allclose(out["translation"], ref["translation"],
                                   atol=1e-6)

    # async dispatch + fetch equals sync infer
    a = server.fetch(server.infer_async(frames[0], boxes=b, labels=l, n_boxes=n))
    s = server.infer(frames[0], boxes=b, labels=l, n_boxes=n)
    np.testing.assert_allclose(a["rotation"], s["rotation"], atol=1e-6)
