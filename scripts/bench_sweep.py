"""Perf sweep on the real chip: f32 vs bf16, per-component timing.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_sweep.py [dtype]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def device_time(fn, args, n=5):
    """Marginal time per iteration of a chained loop (bench.py methodology)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def loop_fn(n_iters):
        @jax.jit
        def loop(args, salt):
            def body(i, carry):
                out = fn(*args, salt + 1e-7 * carry)
                return out
            return lax.fori_loop(0, n_iters, body, jnp.float32(0.0))
        return loop

    l1, l2 = loop_fn(n), loop_fn(2 * n)
    float(l1(args, jnp.float32(0.0)))
    float(l2(args, jnp.float32(0.0)))

    def timed(l, s):
        t0 = time.perf_counter()
        float(l(args, jnp.float32(s)))
        return time.perf_counter() - t0

    t1 = min(timed(l1, 1e-6), timed(l1, 2e-6))
    t2 = min(timed(l2, 3e-6), timed(l2, 4e-6))
    return max(t2 - t1, 1e-9) / n


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_setup
    from poet_tpu.config import PoETConfig
    from poet_tpu.models import build_model

    B = 16
    cfg, model, images, pad_mask, targets = _flagship_setup(B=B, H=480, W=640)
    cfg.model.dtype = dtype
    model = build_model(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad_mask, targets)

    def fwd(params, images, pad_mask, targets, salt):
        out = model.apply(params, images * (1.0 + salt), pad_mask, targets,
                          deterministic=True)
        return jnp.mean(out["translations"].astype(jnp.float32))

    dt = device_time(fwd, (params, images, pad_mask, targets))
    print(f"dtype={dtype}: {dt*1e3:.2f} ms/batch, {B/dt:.1f} img/s")


if __name__ == "__main__":
    main()
