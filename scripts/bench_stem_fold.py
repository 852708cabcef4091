"""A/B layout experiments for the pathological small-C stride-2 CSP convs.

The r5 YOLO xplane profile shows the early CSP convs (3x3/s2 32->64 at
480x640 and 64->128 at 240x320, each fused with mish) costing 5.7 + 2.8
ms/iter at bs=16 against a ~0.8 ms combined MAC+HBM roofline: XLA's chosen
layout puts BATCH in sublanes and the small channel count in half-empty
lanes (same disease as the ResNet 7x7 stem, README negative-results
section). Two exact reformulations attack the layout, both avoiding the
full 2-D space-to-depth's fatal height-phase transpose (measured 12.5 vs
5.7 ms standalone in r4):

  * bfold — fold BATCH into the height axis (a free reshape: images are
    row-contiguous in NHWC and independent). The conv runs on
    (1, B*H, W, C) with stride 2; because 480 is even every output row
    lands on an image-aligned phase, and only the FIRST output row of each
    image reads one real row of the previous image where the original saw
    zero padding. A 16-row fix-up conv (taps dy in {0,+1} only) recomputes
    those rows exactly and a dynamic_update_slice drops them in.
  * wfold — width-phase-only space-to-depth: (B, H, W, C) ->
    (B, H, W/2, 2C) is a pure reinterpretation of the (W, C)-contiguous
    minor dims (NO data movement, unlike the height phase); the 3x3/s2
    conv becomes an exact 3x2 conv with stride (2,1), left-only width pad,
    and a (3,2,2C,O) kernel holding the taps (the (kx'=0, px=0) quadrant
    has no matching tap and carries zeros).
  * bwfold — both.

Each variant is verified bit-exact against the plain XLA conv in f32 and
timed in bf16 with a mish epilogue (the production fusion).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_stem_fold.py
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import _marginal_loop  # noqa: E402
from poet_tpu.models.yolov4 import mish  # noqa: E402


def conv_xla(x, k, stride=2):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(stride, stride), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _wfold_kernel(k):
    """(3,3,C,O) -> (3,2,2C,O) for the width-phase-folded conv."""
    C, O = k.shape[2], k.shape[3]
    w2 = jnp.zeros((3, 2, 2, C, O), k.dtype)
    w2 = w2.at[:, 0, 1].set(k[:, 0])   # dx=-1 via (kx'=0, px=1)
    w2 = w2.at[:, 1, 0].set(k[:, 1])   # dx= 0 via (kx'=1, px=0)
    w2 = w2.at[:, 1, 1].set(k[:, 2])   # dx=+1 via (kx'=1, px=1)
    return w2.reshape(3, 2, 2 * C, O)


def conv_wfold(x, k):
    B, H, W, C = x.shape
    x2 = x.reshape(B, H, W // 2, 2 * C)          # free reinterpretation
    w2 = _wfold_kernel(k)
    return jax.lax.conv_general_dilated(
        x2, w2, window_strides=(2, 1), padding=[(1, 1), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_bfold(x, k):
    """Batch folded into H (free reshape) + exact 16-row boundary fix-up."""
    B, H, W, C = x.shape
    O = k.shape[-1]
    xf = x.reshape(1, B * H, W, C)
    y = jax.lax.conv_general_dilated(
        xf, k, window_strides=(2, 2), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(B, H // 2, W // 2, O)
    # first output row of each image read the previous image's last row
    # where the unfolded conv saw zero padding: recompute it from rows
    # {0, 1} with the dy in {0, +1} taps only (dy=-1 tap hits the pad).
    top = jax.lax.conv_general_dilated(
        x[:, :2], k[1:], window_strides=(2, 2), padding=[(0, 0), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))     # (B, 1, W/2, O)
    return jnp.concatenate([top, y[:, 1:]], axis=1)


def conv_bwfold(x, k):
    B, H, W, C = x.shape
    O = k.shape[-1]
    x2 = x.reshape(1, B * H, W // 2, 2 * C)
    w2 = _wfold_kernel(k)
    y = jax.lax.conv_general_dilated(
        x2, w2, window_strides=(2, 1), padding=[(1, 1), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(B, H // 2, W // 2, O)
    top = jax.lax.conv_general_dilated(
        x[:, :2].reshape(B, 2, W // 2, 2 * C), w2[1:],
        window_strides=(2, 1), padding=[(0, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.concatenate([top, y[:, 1:]], axis=1)


VARIANTS = {
    "xla": lambda x, k: conv_xla(x, k),
    "wfold": conv_wfold,
    "bfold": conv_bfold,
    "bwfold": conv_bwfold,
}

CONFIGS = [
    ("32->64 @480x640", (16, 480, 640, 32), 64),
    ("64->128 @240x320", (16, 240, 320, 64), 128),
]


def main():
    rng = np.random.default_rng(0)
    for name, in_shape, O in CONFIGS:
        B, H, W, C = in_shape
        x32 = jnp.asarray(rng.standard_normal(in_shape), jnp.float32)
        k32 = jnp.asarray(rng.standard_normal((3, 3, C, O)) * 0.05,
                          jnp.float32)
        ref = np.asarray(jax.jit(conv_xla)(x32, k32))
        print(f"== {name} (bs={B}) ==")
        x16, k16 = x32.astype(jnp.bfloat16), k32.astype(jnp.bfloat16)
        for vname, fn in VARIANTS.items():
            got = np.asarray(jax.jit(fn)(x32, k32))
            err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
            # timed in bf16 with the mish epilogue (production fusion)
            def make_loop(n, fn=fn):
                @jax.jit
                def loop(x, k, salt):
                    def body(i, c):
                        y = mish(fn(x + (c * 1e-9 + salt).astype(x.dtype), k))
                        return jnp.sum(y[0, -1, -1].astype(jnp.float32))
                    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
                return lambda s: float(loop(x16, k16, jnp.bfloat16(s)))
            dt = _marginal_loop(make_loop, n=8, reps=3, max_reps=8)
            flops = 2 * B * (H // 2) * (W // 2) * O * C * 9
            print(f"  {vname:8s} rel_err={err:.2e}  {dt*1e3:7.3f} ms/iter "
                  f"({flops / dt / 1e12:5.1f} TF/s eff)")


if __name__ == "__main__":
    main()
