"""Does the MXU pay for K=128 when the contraction dim is smaller?

The fused deformable-sampling kernel's x-mix dots have K = W_l (feature-map
width: 80/40/20/10 at YOLO scale, 40/20/10/5 at rcnn scale). If Mosaic's
tpu.matmul pads K to the full 128 systolic dimension, those dots run at
W_l/128 K-utilization and the kernel's MAC floor at YOLO shapes is ~15 ms,
not the ~7 ms the unpadded count suggests — which decides whether further
tuning should attack the dot structure or the VPU epilogue.

Method: one Pallas kernel per K that chains R dependent dots
(M, K) @ (K, N) on VMEM-resident operands (no HBM traffic in the loop) and
a grid long enough to amortize launch cost. Reports achieved MAC/s against
both the true-K and the padded-K count.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_kpad.py
"""

from __future__ import annotations

import time

import numpy as np


def bench_k(K, M=960, N=512, R=64, G=256, dtype_name="bfloat16"):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        acc = jnp.zeros((M, N), jnp.float32)
        for i in range(R):
            # each dot's operand mixes in the previous accumulator scaled by
            # 1e-30 (numerically a no-op in bf16/f32, but NOT foldable: a
            # scalar salt factors algebraically out of the dot, and x*0 is
            # only removable under fast-math). The feedback serializes the
            # dots; at M=960 the ~K-cycle pipeline drain per dot is <10% and
            # identical across the K sweep, so K-relative ratios stand.
            a_i = a + (acc[:, :K] * 1e-30).astype(dtype)
            acc = acc + jax.lax.dot_general(
                a_i, b,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[...] = acc

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(M, K)), dtype)
    b = jnp.asarray(rng.normal(size=(K, N)), dtype)

    fn = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((M, K), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((K, N), lambda g: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M, N), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
    )
    jitted = jax.jit(lambda a, b: fn(a, b).mean())
    float(jitted(a, b))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jitted(a, b))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    macs_true = M * K * N * R * G
    macs_pad = M * 128 * N * R * G
    print(f"K={K:4d}: {dt*1e3:8.2f} ms  "
          f"true {macs_true/dt/1e12:6.1f} TMAC/s  "
          f"if-padded-to-128 {macs_pad/dt/1e12:6.1f} TMAC/s")
    return dt


def main():
    print("M=960 N=512 R=64 G=256 bf16 — chained VMEM-resident dots")
    t128 = bench_k(128)
    for k in (112, 96, 80, 64, 40, 32, 16):
        tk = bench_k(k)
        print(f"    -> t(K={k})/t(K=128) = {tk/t128:.3f} "
              f"(K-proportional would be {k/128:.3f})")


if __name__ == "__main__":
    main()
