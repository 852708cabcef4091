"""On-chip A/B: Pallas RoI-align chunk size (POET_ROI_CB) at production shape.

The kernel's grid is (B, R/CB); at R=1000, CB=8 means 2000 program
activations per bs=16 batch. This times the standalone op for several CB
values to separate per-program overhead from per-box compute.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_roi_cb.py
"""

import importlib
import os
import time

import numpy as np


def run_one(cb):
    os.environ["POET_ROI_CB"] = str(cb)
    import jax
    import jax.numpy as jnp
    from jax import lax

    import poet_tpu.ops.roi_align_pallas as rap

    importlib.reload(rap)
    assert rap._CB == cb

    rng = np.random.default_rng(0)
    B, R, C = 16, 1000, 256
    shapes = [(120, 160), (60, 80), (30, 40), (15, 20)]
    feats = [jnp.asarray(rng.standard_normal((B, h, w, C)), jnp.bfloat16)
             for h, w in shapes]
    # torchvision-plausible boxes in image coords (480x640, strides from 4)
    cx = rng.uniform(40, 600, (B, R))
    cy = rng.uniform(40, 440, (B, R))
    bw = rng.uniform(16, 240, (B, R))
    bh = rng.uniform(16, 240, (B, R))
    boxes = jnp.asarray(
        np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1),
        jnp.float32)

    @jax.jit
    def loop(boxes, n, salt):
        def body(i, c):
            out = rap.multiscale_roi_align_pallas(
                feats, [4, 8, 16, 32], boxes + salt * i, output_size=7,
                sampling_ratio=2, padded_output=True)
            return jnp.mean(out.astype(jnp.float32))

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(n, salt):
        t0 = time.perf_counter()
        float(loop(boxes, n, jnp.float32(salt)))
        return time.perf_counter() - t0

    timed(4, 0.0); timed(8, 0.0)          # compile both
    bn = b2 = float("inf")
    for k in range(6):
        bn = min(bn, timed(4, (2 * k + 1) * 1e-6))
        b2 = min(b2, timed(8, (2 * k + 2) * 1e-6))
    dt = max(b2 - bn, 1e-9) / 4
    print(f"CB={cb:3d}: {dt * 1e3:7.2f} ms/batch", flush=True)


if __name__ == "__main__":
    import sys

    cbs = [int(a) for a in sys.argv[1:]] or [8, 16, 32, 64]
    for cb in cbs:
        # separate process per CB would be cleaner; reload suffices since
        # _CB is read at import and the jit cache keys on the reloaded fn
        run_one(cb)
