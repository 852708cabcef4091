"""Standalone deformable-attention core timing at encoder shapes.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_deform.py [impl] [dtype]
impl in {mxu, xla, pallas_v3}
"""

from __future__ import annotations

import sys
import time

import numpy as np

import os as _os
# DEFORM_SHAPES=yolo selects the YOLOv4-CSP encoder pyramid (strides 8/16/32
# + extra stride-64 level, 640x480 input) -> S = 6380 tokens; default is the
# Mask R-CNN pyramid (strides 16/32/64 + extra 128) -> S = 1580.
SHAPES = ([(60, 80), (30, 40), (15, 20), (8, 10)]
          if _os.environ.get("DEFORM_SHAPES") == "yolo"
          else [(30, 40), (15, 20), (8, 10), (4, 5)])


def main():
    impl = sys.argv[1] if len(sys.argv) > 1 else "mxu"
    dtype_s = sys.argv[2] if len(sys.argv) > 2 else "float32"
    import jax
    import jax.numpy as jnp
    from jax import lax

    dtype = jnp.bfloat16 if dtype_s == "bfloat16" else jnp.float32
    B, H, D, L, P = 16, 16, 16, 4, 4
    S = sum(h * w for h, w in SHAPES)
    Q = S  # encoder self-attention

    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.normal(size=(B, S, H, D)), dtype)
    if len(sys.argv) > 3 and sys.argv[3] == "local":
        # encoder-like: each query samples near its own pixel
        refs = []
        for h, w in SHAPES:
            yy, xx = np.meshgrid((np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w,
                                 indexing="ij")
            refs.append(np.stack([xx.ravel(), yy.ravel()], -1))
        ref = np.concatenate(refs, 0)  # (S, 2)
        loc = ref[None, :, None, None, None, :] + rng.uniform(
            -0.02, 0.02, size=(B, Q, H, L, P, 2))
        loc = jnp.asarray(loc, jnp.float32)
    else:
        loc = jnp.asarray(rng.uniform(0, 1, size=(B, Q, H, L, P, 2)), jnp.float32)
    attn = jnp.asarray(rng.uniform(size=(B, Q, H, L, P)), jnp.float32)
    attn = attn / attn.sum(axis=(-2, -1), keepdims=True)
    attn = attn.astype(dtype)
    loc = loc.astype(dtype)

    if impl == "mxu":
        from poet_tpu.ops.deform_attn import ms_deform_attn_mxu as op
    elif impl == "sep":
        from poet_tpu.ops.deform_attn import ms_deform_attn_sep as op
    elif impl == "patch":
        from poet_tpu.ops.deform_attn import ms_deform_attn_patch as op
    elif impl == "xla":
        from poet_tpu.ops.deform_attn import ms_deform_attn_xla as op
    elif impl == "pallas_v3":
        from poet_tpu.ops.deform_attn_pallas_v3 import ms_deform_attn_pallas_v3 as op
    else:
        raise SystemExit(f"unknown impl {impl}")

    def fn_of(n_iters):
        @jax.jit
        def fn(value, loc, attn, salt):
            def body(i, carry):
                l = loc * (1 + carry * 1e-9)
                vv = (value * (1 + carry * 1e-9)).astype(value.dtype)
                out = op(vv, SHAPES, l, attn)
                return jnp.mean(out.astype(jnp.float32)) + salt
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
    print(f"impl={impl} dtype={dtype_s}: {dt*1e3:.2f} ms/layer-call (B={B}, Q=S={S})")


if __name__ == "__main__":
    main()
