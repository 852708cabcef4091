"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric (BASELINE.md): YCB-V-shaped inference throughput, batch 16,
640x480, paper config (5 enc / 5 dec / 16 heads, hidden 256, 10 queries),
images/sec on one chip. vs_baseline compares against the reference's only
published figure: 50 FPS TensorRT on Jetson AGX Orin
(/root/reference/README.md:35).

The same JSON line carries an "extra" object with the secondary BASELINE.md
configs (VERDICT r1 items 2 & 6):
  * maskrcnn_detect_pose_img_s — bs=16 DETECTOR-IN-THE-LOOP throughput
    (bbox_mode='backbone': ResNet-50-FPN + RPN + RoI heads + PoET, the
    reference's deployed mode, /root/reference/main.py:407),
  * yolov4_full_pyramid_img_s — bs=16 YOLOv4-CSP detect+pose in the
    REFERENCE configuration (all three CSP scales feed PoET, S=6380),
  * yolov4_detect_pose_img_s  — bs=16 YOLOv4-CSP detect+pose with the
    TPU-first trimmed encoder (strides >= 16; an extension config),
  * bs1_latency_ms            — gt-mode single-image device latency,
  * train_step_img_s          — bs=16 full train step (fwd+match+loss+bwd+opt).
Set POET_BENCH_EXTRA=0 to skip the extras (primary metric only).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

YOLO_CFG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "configs", "ycbv_yolov4-csp.cfg")


def _marginal_loop(make_loop, n=5, reps=4, patience=3, max_reps=12):
    """Device time per iteration: marginal between N and 2N chained in-jit
    iterations with a forced host read (cancels the ~1.3 s relay round-trip;
    identical repeated dispatches can be cache-served by the relay, hence the
    salt). Validated against a known-FLOPs matmul chain (85 TF/s f32 v5e).

    The relay's latency noise is one-sided (observed spread up to 60% on a
    single dispatch, and multi-minute congestion phases), so min is the right
    estimator — but a FIXED rep count under heavy-tailed noise left ±4%
    run-to-run scatter on the headline (574 vs 620 img/s on identical code,
    2026-08-19). Two fixes: the arms are INTERLEAVED (a congestion phase
    inflates both, cancelling in the difference instead of biasing one arm),
    and reps are ADAPTIVE — keep timing pairs until neither arm's min has
    improved by >0.2% for `patience` consecutive pairs (at least `reps`,
    at most `max_reps` pairs)."""
    loop_n, loop_2n = make_loop(n), make_loop(2 * n)
    loop_n(0.0)        # compile
    loop_2n(0.0)       # compile

    def timed(fn, salt):
        t0 = time.perf_counter()
        fn(salt)
        return time.perf_counter() - t0

    best_n = best_2n = float("inf")
    stale = 0
    k = 0
    while k < max_reps and (k < reps or stale < patience):
        t_n = timed(loop_n, (2 * k + 1) * 1e-6)
        t_2n = timed(loop_2n, (2 * k + 2) * 1e-6)
        improved = (t_n < best_n * 0.998) or (t_2n < best_2n * 0.998)
        best_n = min(best_n, t_n)
        best_2n = min(best_2n, t_2n)
        stale = 0 if improved else stale + 1
        k += 1
    return max(best_2n - best_n, 1e-9) / n


def _forward_rate(model, params, images, pad_mask, targets, n=5):
    import jax
    import jax.numpy as jnp
    from jax import lax

    def make_loop(n_iters):
        @jax.jit
        def loop(params, images, salt):
            def body(i, carry):
                img = images * (1.0 + 1e-7 * carry) + salt
                out = model.apply(params, img, pad_mask, targets,
                                  deterministic=True)
                return jnp.mean(out["translations"].astype(jnp.float32))

            return lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

        return lambda s: float(loop(params, images, jnp.float32(s)))

    dt = _marginal_loop(make_loop, n=n)
    return images.shape[0] / dt, dt


def bench_primary():
    """gt-bbox flagship, bs=16, fused Pallas sampling kernel, bf16 compute."""
    import jax

    from __graft_entry__ import _flagship_setup

    cfg, model, images, pad_mask, targets = _flagship_setup(B=16, H=480, W=640)
    # pin the fused kernel so the benchmarked path never depends on backend
    # detection (config default 'auto' resolves to 'fused' on TPU anyway)
    cfg.model.enc_deform_impl = "fused"
    from poet_tpu.models import build_model

    model = build_model(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad_mask, targets)
    # bf16 weights at rest: removes ~1.2 ms/batch of in-program f32->bf16
    # weight converts (bit-identical outputs; see utils/params.py)
    from poet_tpu.utils.params import cast_params_for_inference

    params = cast_params_for_inference(params)
    # n=16: the marginal between the arms is ~16 batches (~0.4 s of device
    # time), 5x the relay's RTT noise floor — at the default n=5 the signal
    # was only ~130 ms and relay jitter dominated the estimate
    rate, _ = _forward_rate(model, params, images, pad_mask, targets, n=16)
    return rate


def bench_maskrcnn_detect_pose(B=16):
    """Detector-in-the-loop: full Mask R-CNN (RPN + RoI heads) + PoET.

    The reference's deployable mode forces bbox_mode='backbone'
    (/root/reference/main.py:407); its 50 FPS Jetson figure is a full
    detect+pose pipeline, so THIS is the apples-to-apples config."""
    import jax

    from poet_tpu.config import PoETConfig
    from poet_tpu.models import build_model
    from poet_tpu.utils.params import cast_params_for_inference

    cfg = PoETConfig()
    cfg.backbone.name = "maskrcnn"
    cfg.model.dtype = "bfloat16"
    cfg.model.bbox_mode = "backbone"
    cfg.model.enc_deform_impl = "fused"
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    images = jnp.asarray(rng.uniform(size=(B, 480, 640, 3)).astype(np.float32))
    pad_mask = jnp.zeros((B, 480, 640), bool)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad_mask, None)
    params = cast_params_for_inference(params)
    rate, _ = _forward_rate(model, params, images, pad_mask, None)
    return rate


def bench_yolov4_detect_pose(B=16, encoder_min_stride=16):
    """YOLOv4-CSP detect+pose.

    encoder_min_stride=16 is the TPU-first trimmed-encoder option (PoET
    consumes strides >= 16, the same levels the rcnn path feeds it;
    detections keep all scales). encoder_min_stride=1 is the REFERENCE
    configuration — the reference wrapper feeds PoET all three CSP scales
    (strides 8/16/32, S=6380 tokens; /root/reference/README.md:105-107) —
    reported as yolov4_full_pyramid_img_s."""
    if not os.path.exists(YOLO_CFG):
        return None
    import jax
    import jax.numpy as jnp

    from poet_tpu.config import PoETConfig
    from poet_tpu.models import build_model
    from poet_tpu.utils.params import cast_params_for_inference

    cfg = PoETConfig()
    cfg.model.dtype = "bfloat16"
    cfg.backbone.name = "yolov4"
    cfg.backbone.cfg_path = YOLO_CFG
    cfg.backbone.max_detections = 20
    cfg.backbone.encoder_min_stride = encoder_min_stride
    cfg.model.bbox_mode = "backbone"
    cfg.model.n_classes = 21
    cfg.model.enc_deform_impl = "fused"
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(B, 480, 640, 3)).astype(np.float32))
    pad_mask = jnp.zeros((B, 480, 640), bool)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad_mask, None)
    params = cast_params_for_inference(params)
    rate, _ = _forward_rate(model, params, images, pad_mask, None)
    return rate


def bench_yolov4_full_pyramid(B=16):
    """Reference-config YOLOv4 detect+pose: full stride-8/16/32 pyramid."""
    return bench_yolov4_detect_pose(B=B, encoder_min_stride=1)


def bench_bs1_latency_ms():
    import jax

    from __graft_entry__ import _flagship_setup

    cfg, model, images, pad_mask, targets = _flagship_setup(B=1, H=480, W=640)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad_mask, targets)
    _, dt = _forward_rate(model, params, images, pad_mask, targets)
    return dt * 1e3


def bench_train_step_img_s(B=16):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from __graft_entry__ import _flagship_setup
    from poet_tpu.engine.train import TrainState, make_optimizer, make_train_step

    cfg, model, images, pad_mask, targets = _flagship_setup(B=B, H=480, W=640)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad_mask, targets)
    tx = make_optimizer(cfg, params, steps_per_epoch=100)
    state0 = TrainState(params=params, opt_state=tx.init(params),
                        step=jnp.zeros((), jnp.int32))
    step_fn = make_train_step(model, cfg, tx, donate=False)
    # rbg dropout keys: the recommended TPU training config (--rng_impl rbg,
    # config.py:248-254). threefry2x32 spends ~10 ms/step of VPU on mask
    # generation for zero statistical benefit to dropout; rbg measured +13%
    # on this step (VALIDATION r3 A/B). The CLI default stays threefry for
    # reference-stream reproducibility; the bench reports the config a
    # production TPU run would use, exactly as it pins enc_deform_impl.
    rng = jax.random.key(0, impl="rbg")

    def make_loop(n_iters):
        @jax.jit
        def loop(state, images, salt):
            def body(i, st):
                st2, _ = step_fn(st, images * (1 + salt), pad_mask, targets, rng)
                return st2

            final = lax.fori_loop(0, n_iters, body, state)
            # force the full update chain (returning .step alone would DCE it)
            return final.params["params"]["transformer"]["level_embed"].mean()

        return lambda s: float(loop(state0, images, jnp.float32(s)))

    dt = _marginal_loop(make_loop, n=3)
    return B / dt


def main():
    primary = bench_primary()
    result = {
        "metric": "ycbv_inference_images_per_sec_per_chip_bs16",
        "value": round(primary, 2),
        "unit": "images/sec",
        "vs_baseline": round(primary / 50.0, 3),
    }
    if os.environ.get("POET_BENCH_EXTRA", "1") != "0":
        extra = {}
        for key, fn in (
            ("maskrcnn_detect_pose_img_s", bench_maskrcnn_detect_pose),
            # reference config: all three CSP scales feed PoET (S=6380)
            ("yolov4_full_pyramid_img_s", bench_yolov4_full_pyramid),
            # TPU-first trimmed-encoder extra (encoder_min_stride=16)
            ("yolov4_detect_pose_img_s", bench_yolov4_detect_pose),
            ("bs1_latency_ms", bench_bs1_latency_ms),
            ("train_step_img_s", bench_train_step_img_s),
        ):
            try:
                v = fn()
                if v is not None:
                    extra[key] = round(v, 2)
            except Exception as e:  # never let a secondary kill the primary
                extra[key] = f"error: {type(e).__name__}: {e}"[:200]
        result["extra"] = extra
    print(json.dumps(result))


if __name__ == "__main__":
    # Device-tunnel outages hang every jax call inside PJRT client creation,
    # where no Python-level timeout can fire (the main thread never returns
    # to bytecode, so a Python SIGALRM handler would never run). The DEFAULT
    # SIGALRM disposition kills the process at the kernel level regardless —
    # an indefinite driver hang becomes a clean failure. 40 min >> the worst
    # cold compile through the relay.
    import signal
    import sys

    signal.alarm(2400)
    print(
        "bench.py: contacting the TPU (axon tunnel). If this process dies on "
        "SIGALRM ('Alarm clock', rc=142) the tunnel is in an outage: device "
        "calls hang inside PJRT client creation (observed multi-hour outages; "
        "see .claude/skills/verify/SKILL.md).",
        file=sys.stderr,
        flush=True,
    )
    main()
    signal.alarm(0)
