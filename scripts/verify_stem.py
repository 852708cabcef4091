"""On-chip verification + A/B for the Pallas phase-split stem conv.

1. correctness: conv_stem_pallas vs lax.conv_general_dilated at the three
   model configs on the real chip,
2. timing: marginal chained-iteration A/B (bench.py methodology) of the
   standalone stem, Pallas vs XLA, at the flagship shape.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/verify_stem.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from poet_tpu.ops.conv_stem_pallas import conv_stem_pallas


def _ref(x, w, b, stride, padding, act):
    out = lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        out = out + b
    if act == "relu":
        out = jnp.maximum(out, 0.0)
    elif act == "mish":
        from poet_tpu.models.yolov4 import mish

        out = mish(out)
    return out


def marginal(make_loop, n=8, reps=6):
    loop_n, loop_2n = make_loop(n), make_loop(2 * n)
    loop_n(0.0)
    loop_2n(0.0)
    bn = b2 = float("inf")
    for k in range(reps):
        t0 = time.perf_counter(); loop_n((2 * k + 1) * 1e-6)
        bn = min(bn, time.perf_counter() - t0)
        t0 = time.perf_counter(); loop_2n((2 * k + 2) * 1e-6)
        b2 = min(b2, time.perf_counter() - t0)
    return max(b2 - bn, 1e-9) / n


def main():
    rng = np.random.default_rng(0)
    configs = [
        ("resnet-stem", (16, 480, 640, 3), (7, 7, 3, 64), 2, ((3, 3), (3, 3)), "relu"),
        ("yolo-l0", (16, 480, 640, 3), (3, 3, 3, 32), 1, ((1, 1), (1, 1)), "mish"),
        ("yolo-l1", (16, 480, 640, 32), (3, 3, 32, 64), 2, ((1, 1), (1, 1)), "mish"),
    ]
    for name, xs, ws, s, pad, act in configs:
        for dt in (jnp.float32, jnp.bfloat16):
            x = jnp.asarray(rng.uniform(-1, 1, xs), dt)
            w = jnp.asarray(rng.standard_normal(ws) * 0.1, dt)
            b = jnp.asarray(rng.standard_normal(ws[-1]), jnp.float32)
            out = jax.jit(lambda x, w, b: conv_stem_pallas(
                x, w, b, stride=s, padding=pad, activation=act))(x, w, b)
            ref = jax.jit(lambda x, w, b: _ref(x, w, b, s, pad, act))(x, w, b)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            tol = 1e-3 if dt == jnp.float32 else 0.3
            status = "OK" if err < tol else "FAIL"
            print(f"{name} {jnp.dtype(dt).name}: max abs err {err:.2e} {status}",
                  flush=True)

            def mk(n_iters, fn):
                @jax.jit
                def loop(x, w, b, salt):
                    def body(i, c):
                        # keep the perturbation IN the operand dtype and
                        # large enough to survive bf16 rounding: a tiny f32
                        # salt silently promoted x to f32 (and a sub-eps
                        # bf16 factor rounds to 1.0, letting XLA hoist the
                        # conv out of the loop) — both failure modes were
                        # hit and fixed 2026-08-20
                        f = (1 + (salt + c * 1e-6) * 1e-2).astype(x.dtype)
                        o = fn(x * f, w, b)
                        return jnp.mean(o.astype(jnp.float32))

                    return lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

                return lambda sv: float(loop(x, w, b, jnp.float32(sv)))

            if dt == jnp.bfloat16:
                t_pal = marginal(lambda n: mk(n, lambda x, w, b: conv_stem_pallas(
                    x, w, b, stride=s, padding=pad, activation=act)))
                t_xla = marginal(lambda n: mk(n, lambda x, w, b: _ref(
                    x, w, b, s, pad, act).astype(dt)))
                print(f"  {name} bf16: pallas {t_pal*1e3:.3f} ms  "
                      f"xla {t_xla*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
