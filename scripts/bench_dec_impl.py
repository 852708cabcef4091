"""On-chip A/B: decoder cross-attn sampling core at the YOLO full pyramid.

Times the bs=16 reference-config YOLOv4-CSP detect+pose forward with the
decoder forced to each impl. Decides DEC_FUSED_MIN_S's verdict at S=6380
(models/transformer.py:resolve_dec_impl).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_dec_impl.py [mxu fused gather]
"""

import os
import sys
import time

import numpy as np

YOLO_CFG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "configs", "ycbv_yolov4-csp.cfg")


def run_one(impl):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from poet_tpu.config import PoETConfig
    from poet_tpu.models import build_model
    from poet_tpu.utils.params import cast_params_for_inference

    cfg = PoETConfig()
    cfg.model.dtype = "bfloat16"
    cfg.backbone.name = "yolov4"
    cfg.backbone.cfg_path = YOLO_CFG
    cfg.backbone.max_detections = 20
    cfg.backbone.encoder_min_stride = 1
    cfg.model.bbox_mode = "backbone"
    cfg.model.n_classes = 21
    cfg.model.enc_deform_impl = "fused"
    cfg.model.dec_deform_impl = impl
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(16, 480, 640, 3)).astype(np.float32))
    pad_mask = jnp.zeros((16, 480, 640), bool)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad_mask, None)
    params = cast_params_for_inference(params)

    @jax.jit
    def loop(params, images, n, salt):
        def body(i, c):
            out = model.apply(params, images * (1.0 + 1e-7 * c) + salt,
                              pad_mask, None, deterministic=True)
            return jnp.mean(out["translations"].astype(jnp.float32))

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(n, salt):
        t0 = time.perf_counter()
        float(loop(params, images, n, jnp.float32(salt)))
        return time.perf_counter() - t0

    timed(3, 0.0); timed(6, 0.0)
    bn = b2 = float("inf")
    for k in range(5):
        bn = min(bn, timed(3, (2 * k + 1) * 1e-6))
        b2 = min(b2, timed(6, (2 * k + 2) * 1e-6))
    dt = max(b2 - bn, 1e-9) / 3
    print(f"dec_impl={impl:7s}: {dt * 1e3:7.2f} ms/batch "
          f"({16 / dt:.1f} img/s)", flush=True)


if __name__ == "__main__":
    for impl in (sys.argv[1:] or ["mxu", "fused"]):
        run_one(impl)
