"""Attribution experiments for the fused v3 deformable-sampling kernel.

Variants of the forward kernel with parts ablated or restructured, to find
where the measured ms/layer actually goes. Usage:

  PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_v3_variants.py <variant>

variants:
  base    — the production kernel (ops/deform_attn_pallas_v3)
  unroll  — heads as a static Python loop instead of fori_loop
  qt256   — 256-query lane tiles (half the grid steps)
  noy     — y-mix replaced by a plain sublane-group sum (no ay build/multiply)
  nox     — dots removed; y-mix applied to a broadcast of vT column 0
            (isolates VPU + loop cost without MXU work)
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

# DEFORM_SHAPES=yolo selects the YOLOv4-CSP full-pyramid geometry (S=6380);
# default is the rcnn/paper pyramid (S=1575).
SHAPES = ([(60, 80), (30, 40), (15, 20), (8, 10)]
          if os.environ.get("DEFORM_SHAPES") == "yolo"
          else [(30, 40), (15, 20), (8, 10), (4, 5)])


def build_variant(name, QT):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from poet_tpu.ops import deform_attn_pallas_v3 as v3

    _F32 = jnp.float32

    def fwd_kernel(xb_ref, yb_ref, ab_ref, *rest, spatial_shapes, H, D, dtype):
        vT_refs = rest[:-1]
        out_ref = rest[-1]
        Qt = out_ref.shape[-1]

        def head_body(h, _):
            acc = jnp.zeros((D, Qt), _F32)
            for lvl, (Hl, Wl) in enumerate(spatial_shapes):
                x = xb_ref[0, lvl, h]
                y = yb_ref[0, lvl, h]
                a = ab_ref[0, lvl, h]
                vT = vT_refs[lvl][0, h]
                P = x.shape[0]
                ops = [v3._corner_ops(x[p:p + 1], y[p:p + 1], a[p:p + 1],
                                      Hl, Wl, Qt) for p in range(P)]
                if name == "nox":
                    gT_all = jnp.broadcast_to(
                        vT[:, 0:1], (Hl * D, P * Qt)).astype(_F32)
                else:
                    bxT_all = jnp.concatenate([o[0] for o in ops], axis=1)
                    gT_all = lax.dot_general(
                        vT, bxT_all.astype(dtype),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=_F32)
                for p in range(P):
                    gT = gT_all[:, p * Qt:(p + 1) * Qt]
                    if name == "noy":
                        acc = acc + jnp.sum(gT.reshape(Hl, D, Qt), axis=0)
                    elif name == "bf16y":
                        # packed-bf16 y-mix: multiply and tree-reduce in
                        # bf16 vregs (2x elements per op), f32 only at the end
                        r = (gT.astype(jnp.bfloat16).reshape(Hl, D, Qt)
                             * ops[p][2].astype(jnp.bfloat16)[:, None, :])
                        while r.shape[0] > 1:
                            n = r.shape[0]
                            half = n // 2
                            odd = r[2 * half:]
                            r = r[:half] + r[half:2 * half]
                            if odd.shape[0]:
                                r = jnp.concatenate([odd, r], axis=0)
                        acc = acc + r[0].astype(_F32)
                    elif name == "treey":
                        prod = gT.reshape(Hl, D, Qt) * ops[p][2][:, None, :]
                        r = prod
                        while r.shape[0] > 1:
                            n = r.shape[0]
                            half = n // 2
                            top = r[half:2 * half]
                            rest = r[2 * half:]
                            r = r[:half] + top
                            if rest.shape[0]:
                                r = jnp.concatenate(
                                    [r[:rest.shape[0]] + rest, r[rest.shape[0]:]],
                                    axis=0)
                        acc = acc + r[0]
                    else:
                        acc = acc + jnp.sum(
                            gT.reshape(Hl, D, Qt) * ops[p][2][:, None, :],
                            axis=0)
            out_ref[0, h] = acc
            return 0

        if name == "unroll":
            for h in range(H):
                head_body(h, 0)
        else:
            lax.fori_loop(0, H, head_body, 0, unroll=False)

    def op(value, spatial_shapes, sampling_locations, attention_weights):
        spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
        B, S, H, D = value.shape
        _, Q, _, L, P, _ = sampling_locations.shape

        old_qt = v3._QT
        v3._QT = QT
        try:
            vT_levels, xb, yb, ab, Q_pad = v3._prep(
                value, spatial_shapes, sampling_locations, attention_weights)
        finally:
            v3._QT = old_qt
        n_qt = Q_pad // QT

        coord_spec = pl.BlockSpec((1, L, H, P, QT),
                                  lambda b, q: (b, 0, 0, 0, q),
                                  memory_space=pltpu.VMEM)
        v_specs = [pl.BlockSpec((1, H, Hl * D, Wl), lambda b, q: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM)
                   for Hl, Wl in spatial_shapes]
        out = pl.pallas_call(
            functools.partial(fwd_kernel, spatial_shapes=spatial_shapes,
                              H=H, D=D, dtype=value.dtype),
            grid=(B, n_qt),
            in_specs=[coord_spec, coord_spec, coord_spec, *v_specs],
            out_specs=pl.BlockSpec((1, H, D, QT), lambda b, q: (b, 0, 0, q),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, D, Q_pad), _F32),
        )(xb, yb, ab, *vT_levels)
        out = out.transpose(0, 3, 1, 2)[:, :Q]
        return out.reshape(B, Q, H * D).astype(value.dtype)

    return op


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    import jax
    import jax.numpy as jnp
    from jax import lax

    if variant == "base":
        from poet_tpu.ops.deform_attn_pallas_v3 import (
            ms_deform_attn_pallas_v3 as op)
    else:
        op = build_variant(variant, 256 if variant == "qt256" else 128)

    dtype = jnp.bfloat16
    B, H, D, L, P = 16, 16, 16, 4, 4
    S = sum(h * w for h, w in SHAPES)
    Q = S
    # generate on-device: uploading ~200 MB of host arrays through the
    # relay tunnel takes minutes at YOLO shapes
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    gen = jax.jit(lambda: (
        jax.random.normal(k1, (B, S, H, D), dtype),
        jax.random.uniform(k2, (B, Q, H, L, P, 2), jnp.float32).astype(dtype),
        jax.random.uniform(k3, (B, Q, H, L, P), jnp.float32),
    ))
    value, loc, attn = gen()
    attn = (attn / attn.sum(axis=(-2, -1), keepdims=True)).astype(dtype)

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
    print(f"variant={variant}: {dt*1e3:.2f} ms/layer-call")


if __name__ == "__main__":
    main()
