"""Low-latency serving path — the TensorRT-deployment equivalent (N9).

The reference's real-time story is an external TensorRT engine (50 FPS on a
Jetson AGX Orin, README.md:35) feeding object-relative state estimation
(EKF) with pose + aleatoric covariance. The TPU-native equivalent:

  * AOT-compiled inference executable (`jax.jit(...).lower().compile()`)
    for a FIXED batch size / image size — no retracing, no Python in the
    loop beyond the dispatch,
  * persistent XLA compilation cache so the engine "builds" once per config
    (`enable_persistent_cache`),
  * donated image buffers, single device round-trip per frame,
  * rolling latency statistics (p50/p95/p99) like a serving stack reports.

Two query sources, matching the reference's deployment modes:
  * detector mode (bbox_mode='backbone'): images in, detections + poses out,
  * tracker mode (gt-style): the caller supplies boxes (e.g. from an EKF
    predictor), PoET refines poses for exactly those boxes.
"""

from __future__ import annotations

import time
from collections import deque
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from poet_tpu.config import PoETConfig
from poet_tpu.models import build_model


def enable_persistent_cache(path: str = "/tmp/poet_tpu_xla_cache"):
    """Persist compiled executables across processes (engine-build-once)."""
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


class PoseServer:
    """Fixed-shape, AOT-compiled pose estimation endpoint.

    Pass ``mesh`` (a `jax.sharding.Mesh` with a 'data' axis) to serve
    data-parallel across local chips: the batch shards over 'data', params
    replicate, and GSPMD partitions the whole program — one server object,
    N-chip throughput (extension; the reference's deployment is a
    single-GPU TensorRT engine, README.md:35).
    """

    def __init__(self, cfg: PoETConfig, params, batch_size: int = 1,
                 image_size=(480, 640), latency_window: int = 1000,
                 mesh=None):
        self.cfg = cfg
        if cfg.model.dtype == "bfloat16":
            # bf16 weights at rest: bit-identical, removes per-call f32->bf16
            # weight converts from the serving program (utils/params.py)
            from poet_tpu.utils.params import cast_params_for_inference

            params = cast_params_for_inference(params)
        self.batch_size = batch_size
        self.image_size = tuple(image_size)
        self.model = build_model(cfg)
        self._latencies = deque(maxlen=latency_window)

        self.mesh = mesh
        jit_kwargs = {}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            assert "data" in mesh.shape, "serving mesh needs a 'data' axis"
            n_data = mesh.shape["data"]
            assert batch_size % n_data == 0, (
                f"batch_size {batch_size} not divisible by data axis {n_data}")
            self._shard_in = NamedSharding(mesh, PartitionSpec("data"))
            repl = NamedSharding(mesh, PartitionSpec())
            params = jax.device_put(params, repl)
            # prefix pytrees: one sharding per argument subtree
            jit_kwargs["in_shardings"] = (repl, self._shard_in, self._shard_in)
        else:
            self._shard_in = None
        self.params = params

        B, (H, W) = batch_size, self.image_size
        Q = cfg.model.num_queries
        img_spec = jax.ShapeDtypeStruct((B, H, W, 3), jnp.float32)
        mask_spec = jax.ShapeDtypeStruct((B, H, W), jnp.bool_)

        if cfg.model.bbox_mode == "backbone":
            def fwd(params, images, pad_mask):
                out = self.model.apply(params, images, pad_mask, None,
                                       deterministic=True)
                return self._outputs(out)

            self._fn = (
                jax.jit(fwd, donate_argnums=(1, 2), **jit_kwargs)
                .lower(params, img_spec, mask_spec)
                .compile()
            )
            self._needs_boxes = False
        else:
            tgt_spec = {
                "boxes": jax.ShapeDtypeStruct((B, Q, 4), jnp.float32),
                "labels": jax.ShapeDtypeStruct((B, Q), jnp.int32),
                "n_boxes": jax.ShapeDtypeStruct((B,), jnp.int32),
            }
            if mesh is not None:
                jit_kwargs["in_shardings"] = (
                    jit_kwargs["in_shardings"] + (self._shard_in,))

            def fwd(params, images, pad_mask, targets):
                out = self.model.apply(params, images, pad_mask, targets,
                                       deterministic=True)
                return self._outputs(out)

            self._fn = (
                jax.jit(fwd, donate_argnums=(1, 2), **jit_kwargs)
                .lower(params, img_spec, mask_spec, tgt_spec)
                .compile()
            )
            self._needs_boxes = True

    def _put(self, x):
        """Host array -> (sharded) device array for one input."""
        if self._shard_in is None:
            return jnp.asarray(x)
        return jax.device_put(np.asarray(x), self._shard_in)

    def _zeros_mask(self):
        B, (H, W) = self.batch_size, self.image_size
        if self._shard_in is None:
            return jnp.zeros((B, H, W), jnp.bool_)
        return jax.device_put(np.zeros((B, H, W), bool), self._shard_in)

    def _targets(self, boxes, labels, n_boxes):
        B, Q = self.batch_size, self.cfg.model.num_queries
        assert boxes is not None, "tracker mode needs boxes (cxcywh, normalized)"
        return {
            "boxes": self._put(np.asarray(boxes, np.float32)),
            "labels": self._put(np.asarray(
                labels if labels is not None else np.ones((B, Q)), np.int32)),
            "n_boxes": self._put(np.asarray(
                n_boxes if n_boxes is not None else np.full(B, Q), np.int32)),
        }

    def _outputs(self, out):
        res = {
            "translation": out["translations"][-1],
            "rotation": out["rotations"][-1],
            "boxes": out["pred_boxes"],
            "classes": out["pred_classes"],
            "n_boxes": out["n_boxes"],
        }
        if self.cfg.model.aleatoric:
            # s = log sigma^2 -> per-axis variances for the EKF consumer
            res["translation_var"] = jnp.exp(out["translations_aleatoric"][-1])
            res["rotation_var"] = jnp.exp(out["rotations_aleatoric"][-1])
        return res

    def infer(self, images: np.ndarray, boxes: Optional[np.ndarray] = None,
              labels: Optional[np.ndarray] = None,
              n_boxes: Optional[np.ndarray] = None) -> Dict[str, np.ndarray]:
        """One synchronous frame (batch). images (B, H, W, 3) float32 [0,1]."""
        B, (H, W) = self.batch_size, self.image_size
        assert images.shape == (B, H, W, 3), images.shape
        t0 = time.perf_counter()
        pad_mask = self._zeros_mask()
        img = self._put(images)
        if self._needs_boxes:
            out = self._fn(self.params, img, pad_mask,
                           self._targets(boxes, labels, n_boxes))
        else:
            out = self._fn(self.params, img, pad_mask)
        host = {k: np.asarray(v) for k, v in out.items()}
        self._latencies.append(time.perf_counter() - t0)
        return host

    def infer_async(self, images: np.ndarray, boxes: Optional[np.ndarray] = None,
                    labels: Optional[np.ndarray] = None,
                    n_boxes: Optional[np.ndarray] = None) -> Dict[str, jnp.ndarray]:
        """Dispatch one frame WITHOUT reading the result back.

        JAX dispatch is asynchronous: this returns device arrays immediately
        while the device computes, so a caller can overlap the next frame's
        preprocessing/IO with this frame's compute (video-rate pipelining).
        Call `fetch` on the returned dict to materialize host arrays.
        """
        B, (H, W) = self.batch_size, self.image_size
        assert images.shape == (B, H, W, 3), images.shape
        pad_mask = self._zeros_mask()
        img = self._put(images)
        if self._needs_boxes:
            return self._fn(self.params, img, pad_mask,
                            self._targets(boxes, labels, n_boxes))
        return self._fn(self.params, img, pad_mask)

    @staticmethod
    def fetch(out: Dict[str, jnp.ndarray]) -> Dict[str, np.ndarray]:
        """Materialize an `infer_async` result on the host (blocks)."""
        return {k: np.asarray(v) for k, v in out.items()}

    def stream(self, frames, boxes_fn=None):
        """Streaming driver over an iterable of (B, H, W, 3) frames.

        Detector mode: PIPELINED — frame k+1 is dispatched before frame k's
        result is read back, overlapping the next frame's host work with the
        device compute (async JAX dispatch does the buffering).

        Tracker mode (boxes_fn given): SERIAL by necessity — boxes_fn is
        called with the PREVIOUS host result (None for the first frame) and
        returns (boxes, labels, n_boxes) for the next dispatch, e.g. an EKF
        predictor feeding refined boxes back in, the reference's deployment
        pattern (README.md:35-36). The feedback edge makes frame k+1 depend
        on frame k's output, so there is nothing to overlap.
        """
        if self._needs_boxes:
            prev_host = None
            for frame in frames:
                b, l, n = boxes_fn(prev_host)
                prev_host = self.fetch(
                    self.infer_async(frame, boxes=b, labels=l, n_boxes=n))
                yield prev_host
            return
        pending = None
        for frame in frames:
            nxt = self.infer_async(frame)
            if pending is not None:
                yield self.fetch(pending)
            pending = nxt
        if pending is not None:
            yield self.fetch(pending)

    def latency_stats(self) -> Dict[str, float]:
        if not self._latencies:
            return {}
        arr = np.asarray(self._latencies) * 1e3
        return {
            "p50_ms": float(np.percentile(arr, 50)),
            "p95_ms": float(np.percentile(arr, 95)),
            "p99_ms": float(np.percentile(arr, 99)),
            "fps": float(self.batch_size / np.mean(arr) * 1e3),
            "frames": len(arr),
        }


# ---------------------------------------------------------------------------
# Portable export — the "engine file" of the TensorRT deployment analogy.
# ---------------------------------------------------------------------------

def export_model(cfg: PoETConfig, params, path: str, batch_size: int = 1,
                 image_size=(480, 640), platforms=("cpu", "tpu")):
    """Serialize the fixed-shape inference function to a self-contained
    on-disk artifact: StableHLO bytes (`jax.export`) + weights (orbax) +
    a config echo.

    Where the reference's deployment ships a TensorRT engine built from the
    model (README.md:35), this ships a compiler-portable serialized program:
    `load_exported(path)` runs it WITHOUT importing any model code —
    multi-platform lowered (cpu + tpu by default), so one artifact serves
    both a dev box and the accelerator fleet.
    """
    import json
    import os

    from jax import export as jax_export

    import orbax.checkpoint as ocp

    if cfg.model.enc_deform_impl == "auto":
        # The artifact must run on every platform it declares; 'auto' would
        # bake the TPU-only Pallas custom call in when exporting from a TPU
        # host. Pin the pure-XLA separable path, which lowers everywhere.
        # An explicit --enc_deform_impl fused (+ platforms=("tpu",)) still
        # exports the kernel path if the user asks for it.
        import copy

        cfg = copy.deepcopy(cfg)
        cfg.model.enc_deform_impl = "sep"

    model = build_model(cfg)
    B, (H, W) = batch_size, tuple(image_size)
    Q = cfg.model.num_queries
    img_spec = jax.ShapeDtypeStruct((B, H, W, 3), jnp.float32)
    mask_spec = jax.ShapeDtypeStruct((B, H, W), jnp.bool_)

    def outputs(out):
        res = {
            "translation": out["translations"][-1],
            "rotation": out["rotations"][-1],
            "boxes": out["pred_boxes"],
            "classes": out["pred_classes"],
            "n_boxes": out["n_boxes"],
        }
        if cfg.model.aleatoric:
            res["translation_var"] = jnp.exp(out["translations_aleatoric"][-1])
            res["rotation_var"] = jnp.exp(out["rotations_aleatoric"][-1])
        return res

    if cfg.model.bbox_mode == "backbone":
        def fwd(params, images, pad_mask):
            return outputs(model.apply(params, images, pad_mask, None,
                                       deterministic=True))

        specs = (params, img_spec, mask_spec)
    else:
        tgt_spec = {
            "boxes": jax.ShapeDtypeStruct((B, Q, 4), jnp.float32),
            "labels": jax.ShapeDtypeStruct((B, Q), jnp.int32),
            "n_boxes": jax.ShapeDtypeStruct((B,), jnp.int32),
        }

        def fwd(params, images, pad_mask, targets):
            return outputs(model.apply(params, images, pad_mask, targets,
                                       deterministic=True))

        specs = (params, img_spec, mask_spec, tgt_spec)

    exported = jax_export.export(jax.jit(fwd), platforms=list(platforms))(*specs)

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "module.bin"), "wb") as f:
        f.write(exported.serialize())
    ocp.PyTreeCheckpointer().save(
        os.path.abspath(os.path.join(path, "params")),
        jax.device_get(params), force=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({
            "batch_size": B, "image_size": [H, W],
            "bbox_mode": cfg.model.bbox_mode,
            "num_queries": Q, "platforms": list(platforms),
        }, f)
    return path


class ExportedPoseServer:
    """Run an `export_model` artifact — no model code needed at load time.

    Serves the same API as the live `PoseServer`: `infer`, `infer_async` /
    `fetch`, pipelined `stream`, and `latency_stats`."""

    def __init__(self, path: str, latency_window: int = 1000):
        import json
        import os

        from jax import export as jax_export

        import orbax.checkpoint as ocp

        self.meta = json.load(open(os.path.join(path, "meta.json")))
        self._exported = jax_export.deserialize(
            open(os.path.join(path, "module.bin"), "rb").read())
        # Place weights on device ONCE: orbax restores host numpy arrays,
        # and leaving them host-side made every infer() re-transfer the full
        # param tree (measured ~2.9 s/frame p50 through the relay vs 219 ms
        # with device-resident weights).
        self.params = jax.device_put(ocp.PyTreeCheckpointer().restore(
            os.path.abspath(os.path.join(path, "params"))))
        self._call = jax.jit(self._exported.call)
        self._latencies = deque(maxlen=latency_window)
        self._needs_boxes = self.meta["bbox_mode"] != "backbone"
        self.batch_size = self.meta["batch_size"]  # for latency_stats/stream

    def infer_async(self, images: np.ndarray, boxes: Optional[np.ndarray] = None,
                    labels: Optional[np.ndarray] = None,
                    n_boxes: Optional[np.ndarray] = None) -> Dict[str, jnp.ndarray]:
        """Dispatch one frame without reading the result back (see
        PoseServer.infer_async)."""
        B = self.meta["batch_size"]
        H, W = self.meta["image_size"]
        Q = self.meta["num_queries"]
        assert images.shape == (B, H, W, 3), images.shape
        pad_mask = jnp.zeros((B, H, W), jnp.bool_)
        img = jnp.asarray(images, jnp.float32)
        if not self._needs_boxes:
            return self._call(self.params, img, pad_mask)
        assert boxes is not None, "tracker mode needs boxes"
        targets = {
            "boxes": jnp.asarray(boxes, jnp.float32),
            "labels": jnp.asarray(
                labels if labels is not None else np.ones((B, Q)), jnp.int32),
            "n_boxes": jnp.asarray(
                n_boxes if n_boxes is not None else np.full(B, Q), jnp.int32),
        }
        return self._call(self.params, img, pad_mask, targets)

    fetch = staticmethod(PoseServer.fetch)

    def infer(self, images: np.ndarray, boxes: Optional[np.ndarray] = None,
              labels: Optional[np.ndarray] = None,
              n_boxes: Optional[np.ndarray] = None) -> Dict[str, np.ndarray]:
        t0 = time.perf_counter()
        out = self.fetch(self.infer_async(images, boxes, labels, n_boxes))
        self._latencies.append(time.perf_counter() - t0)
        return out

    # pipelined detector-mode / serial tracker-mode streaming + latency
    # percentiles — same implementations as the live server
    stream = PoseServer.stream
    latency_stats = PoseServer.latency_stats
