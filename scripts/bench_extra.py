"""Secondary benchmarks (BASELINE.md configs): bs=1 latency, train step, yolov4.

All numbers are DEVICE times via the marginal-chained-iterations methodology
(see bench.py): through the axon relay, wall-clock includes a ~1.3 s constant
round-trip, so p50 "latency" is reported as device time per chained forward.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_extra.py [which]
which in {latency, train, yolo, all}
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

YOLO_CFG = "/root/reference/configs/ycbv_yolov4-csp.cfg"


def _marginal(run_n, n=4):
    """Compile run_n(n) and run_n(2n); return marginal seconds/iteration."""
    f1, f2 = run_n(n), run_n(2 * n)
    f1(0.0)
    f2(0.0)

    def timed(f, s):
        t0 = time.perf_counter()
        f(s)
        return time.perf_counter() - t0

    t1 = min(timed(f1, 1e-6), timed(f1, 2e-6))
    t2 = min(timed(f2, 3e-6), timed(f2, 4e-6))
    return max(t2 - t1, 1e-9) / n


def bench_latency_bs1():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from __graft_entry__ import _flagship_setup

    cfg, model, images, pad_mask, targets = _flagship_setup(B=1, H=480, W=640)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad_mask, targets)

    def run_n(n):
        @jax.jit
        def loop(params, images, salt):
            def body(i, carry):
                out = model.apply(params, images * (1 + carry * 1e-9 + salt),
                                  pad_mask, targets, deterministic=True)
                return jnp.mean(out["translations"].astype(jnp.float32))
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        return lambda s: float(loop(params, images, jnp.float32(s)))

    dt = _marginal(run_n)
    print(f"bs=1 gt-mode device latency: {dt*1e3:.2f} ms/image "
          f"({1/dt:.1f} img/s)")
    return dt


def bench_latency_aleatoric():
    """BASELINE.md: streaming video-rate inference with aleatoric heads."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from __graft_entry__ import _flagship_setup
    from poet_tpu.models import build_model

    cfg, model, images, pad_mask, targets = _flagship_setup(B=1, H=480, W=640)
    cfg.model.aleatoric = True
    model = build_model(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad_mask, targets)

    def run_n(n):
        @jax.jit
        def loop(params, images, salt):
            def body(i, carry):
                out = model.apply(params, images * (1 + carry * 1e-9 + salt),
                                  pad_mask, targets, deterministic=True)
                return (jnp.mean(out["translations"].astype(jnp.float32))
                        + jnp.mean(out["translations_aleatoric"].astype(jnp.float32)))
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        return lambda s: float(loop(params, images, jnp.float32(s)))

    dt = _marginal(run_n)
    print(f"bs=1 aleatoric (pose + per-axis log-variance) device latency: "
          f"{dt*1e3:.2f} ms/image ({1/dt:.1f} img/s)")
    return dt


def bench_train_step():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from __graft_entry__ import _flagship_setup
    from poet_tpu.engine.train import TrainState, make_optimizer, make_train_step
    from poet_tpu.models import build_model

    B = 16
    cfg, model, images, pad_mask, targets = _flagship_setup(B=B, H=480, W=640)
    impl = os.environ.get("TRAIN_ENC_IMPL")
    if impl:
        cfg.model.enc_deform_impl = impl
        model = build_model(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad_mask, targets)
    tx = make_optimizer(cfg, params, steps_per_epoch=100)
    state0 = TrainState(params=params, opt_state=tx.init(params),
                        step=jnp.zeros((), jnp.int32))
    step_fn = make_train_step(model, cfg, tx, donate=False)
    # the step chains through the state (params update each iteration)
    rng = jax.random.PRNGKey(0)

    def run_n(n):
        @jax.jit
        def loop(state, images, salt):
            def body(i, st):
                st2, _ = step_fn(st, images * (1 + salt), pad_mask, targets, rng)
                return st2
            final = lax.fori_loop(0, n, body, state)
            # force the full update chain (returning only .step would DCE it)
            return final.params["params"]["transformer"]["level_embed"].mean()
        return lambda s: float(loop(state0, images, jnp.float32(s)))

    dt = _marginal(run_n, n=3)
    print(f"bs=16 full train step (fwd+match+losses+bwd+adamw): "
          f"{dt*1e3:.2f} ms/step ({B/dt:.1f} img/s)")
    return dt


def bench_yolov4():
    if not os.path.exists(YOLO_CFG):
        print("yolov4: reference cfg not mounted, skipping")
        return None
    import jax
    import jax.numpy as jnp
    from jax import lax

    from poet_tpu.config import PoETConfig
    from poet_tpu.models import build_model

    B = int(os.environ.get("YOLO_BS", 16))
    cfg = PoETConfig()
    cfg.model.dtype = os.environ.get("YOLO_DTYPE", "bfloat16")
    cfg.backbone.name = "yolov4"
    cfg.backbone.cfg_path = YOLO_CFG
    cfg.backbone.max_detections = 20
    # YOLO_ENC_MIN_STRIDE=16 benches the TPU-first trimmed-encoder option
    # (BackboneConfig.encoder_min_stride); default 1 = reference pyramid.
    cfg.backbone.encoder_min_stride = int(os.environ.get("YOLO_ENC_MIN_STRIDE", 1))
    cfg.model.bbox_mode = "backbone"
    cfg.model.n_classes = 21
    if os.environ.get("YOLO_ENC_IMPL"):
        cfg.model.enc_deform_impl = os.environ["YOLO_ENC_IMPL"]
    model = build_model(cfg)
    rng_np = np.random.default_rng(0)
    images = jnp.asarray(rng_np.uniform(size=(B, 480, 640, 3)).astype(np.float32))
    pad_mask = jnp.zeros((B, 480, 640), bool)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad_mask, None)

    def run_n(n):
        @jax.jit
        def loop(params, images, salt):
            def body(i, carry):
                out = model.apply(params, images * (1 + carry * 1e-9 + salt),
                                  pad_mask, None, deterministic=True)
                return jnp.mean(out["translations"].astype(jnp.float32))
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        return lambda s: float(loop(params, images, jnp.float32(s)))

    dt = _marginal(run_n)
    print(f"bs={B} yolov4-CSP backbone-mode inference: {dt*1e3:.2f} ms/batch "
          f"({B/dt:.1f} img/s)")
    return dt


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("latency", "all"):
        bench_latency_bs1()
    if which in ("aleatoric", "all"):
        bench_latency_aleatoric()
    if which in ("train", "all"):
        bench_train_step()
    if which in ("yolo", "all"):
        bench_yolov4()
