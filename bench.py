"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric (BASELINE.md): YCB-V-shaped inference throughput, batch 16,
640x480, paper config (5 enc / 5 dec / 16 heads, hidden 256, 10 queries),
images/sec on one chip. vs_baseline compares against the reference's only
published figure: 50 FPS TensorRT on Jetson AGX Orin
(/root/reference/README.md:35).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from __graft_entry__ import _flagship_setup

    cfg, model, images, pad_mask, targets = _flagship_setup(B=16, H=480, W=640)
    # single-chip inference flagship runs the fused Pallas sampling kernel
    # (ops/deform_attn_pallas_v3.py): measured 623 vs 410 img/s with 'sep'.
    # The config default 'auto' resolves to 'fused' on TPU anyway; pinned
    # here so the benchmarked path never depends on backend detection.
    cfg.model.enc_deform_impl = "fused"
    from poet_tpu.models import build_model

    model = build_model(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad_mask, targets)
    # bf16 weights at rest: removes ~1.2 ms/batch of in-program f32->bf16
    # weight converts (bit-identical outputs; see utils/params.py)
    from poet_tpu.utils.params import cast_params_for_inference

    params = cast_params_for_inference(params)

    # Timing methodology (calibrated for the axon relay, where
    # block_until_ready returns early and identical requests can be served
    # from cache): chain N data-dependent model invocations inside ONE jit,
    # force a HOST READ of the scalar result, and take the MARGINAL time
    # between N and 2N iterations — this cancels the ~1.3 s constant relay
    # round-trip and measures pure device time. Validated against a
    # known-FLOPs matmul chain (measured 85 TF/s f32 on v5e — sane).
    def bench_loop_fn(n_iters):
        @jax.jit
        def bench_loop(params, images, pad_mask, targets, salt):
            def body(i, carry):
                img = images * (1.0 + 1e-7 * carry) + salt
                out = model.apply(params, img, pad_mask, targets, deterministic=True)
                return jnp.mean(out["translations"])

            return lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

        return bench_loop

    n = 5
    loop_n = bench_loop_fn(n)
    loop_2n = bench_loop_fn(2 * n)
    float(loop_n(params, images, pad_mask, targets, jnp.float32(0.0)))    # compile n
    float(loop_2n(params, images, pad_mask, targets, jnp.float32(0.0)))   # compile 2n

    def timed(fn, salt):
        t0 = time.perf_counter()
        float(fn(params, images, pad_mask, targets, jnp.float32(salt)))
        return time.perf_counter() - t0

    t_n = min(timed(loop_n, 1e-6), timed(loop_n, 2e-6))
    t_2n = min(timed(loop_2n, 3e-6), timed(loop_2n, 4e-6))
    dt = max(t_2n - t_n, 1e-9) / n
    images_per_sec = images.shape[0] / dt

    print(
        json.dumps(
            {
                "metric": "ycbv_inference_images_per_sec_per_chip_bs16",
                "value": round(images_per_sec, 2),
                "unit": "images/sec",
                "vs_baseline": round(images_per_sec / 50.0, 3),
            }
        )
    )


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
