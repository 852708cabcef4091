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

    from __graft_entry__ import _flagship_setup

    cfg, model, images, pad_mask, targets = _flagship_setup(B=16, H=480, W=640)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad_mask, targets)

    fwd = jax.jit(lambda p, i, m, t: model.apply(p, i, m, t, deterministic=True))
    out = fwd(params, images, pad_mask, targets)
    jax.block_until_ready(out)

    # timed runs
    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fwd(params, images, pad_mask, targets)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters
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
    main()
