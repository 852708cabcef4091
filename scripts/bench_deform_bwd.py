"""Backward (custom-VJP) timing for the fused deformable-sampling kernel.

Times grad through `ms_deform_attn_fused` at encoder shapes with the
marginal chained-iteration pattern (N vs 2N fori_loop, forced host read).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_deform_bwd.py [dtype]
DEFORM_SHAPES=yolo selects the YOLOv4-CSP pyramid (S=6380); default rcnn (S=1580).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

SHAPES = ([(60, 80), (30, 40), (15, 20), (8, 10)]
          if os.environ.get("DEFORM_SHAPES") == "yolo"
          else [(30, 40), (15, 20), (8, 10), (4, 5)])


def main():
    dtype_s = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    import jax
    import jax.numpy as jnp
    from jax import lax

    from poet_tpu.ops.deform_attn_pallas_v3 import ms_deform_attn_fused as op

    dtype = jnp.bfloat16 if dtype_s == "bfloat16" else jnp.float32
    B, H, D, L, P = 16, 16, 16, 4, 4
    S = sum(h * w for h, w in SHAPES)
    Q = S

    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.normal(size=(B, S, H, D)), dtype)
    loc = jnp.asarray(rng.uniform(0, 1, size=(B, Q, H, L, P, 2)), dtype)
    attn = jnp.asarray(rng.uniform(size=(B, Q, H, L, P)), jnp.float32)
    attn = (attn / attn.sum(axis=(-2, -1), keepdims=True)).astype(dtype)

    def loss(value, loc, attn, scale):
        out = op(value * (1 + scale * 1e-9), SHAPES,
                 loc * (1 + scale * 1e-9), attn)
        return jnp.mean(out.astype(jnp.float32))

    grad = jax.grad(loss, argnums=(0, 1, 2))

    def fn_of(n_iters):
        @jax.jit
        def fn(value, loc, attn, salt):
            def body(i, carry):
                gv, gl, ga = grad(value, loc, attn, carry)
                return (carry + jnp.mean(gv.astype(jnp.float32))
                        + jnp.mean(gl.astype(jnp.float32))
                        + jnp.mean(ga.astype(jnp.float32)) + salt)
            return lax.fori_loop(0, n_iters, body, jnp.float32(0.0))
        return fn

    n = 4
    f1, f2 = fn_of(n), fn_of(2 * n)
    float(f1(value, loc, attn, jnp.float32(0.0)))
    float(f2(value, loc, attn, jnp.float32(0.0)))

    def timed(f, s):
        t0 = time.perf_counter()
        float(f(value, loc, attn, jnp.float32(s)))
        return time.perf_counter() - t0

    t1 = min(timed(f1, 1e-6), timed(f1, 2e-6))
    t2 = min(timed(f2, 3e-6), timed(f2, 4e-6))
    dt = max(t2 - t1, 1e-9) / n
    print(f"fused fwd+bwd dtype={dtype_s}: {dt*1e3:.2f} ms/layer-call "
          f"(B={B}, Q=S={S})")


if __name__ == "__main__":
    main()
