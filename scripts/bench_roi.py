"""On-chip A/B of MultiScaleRoIAlign implementations at production scale.

Interleaved same-process arms (tpu-bench-noise rule): pallas VMEM-resident
pyramid vs XLA slab-gather, bs=16 x 1000 proposals, rcnn pyramid, bf16.
Also checks numerics pallas-vs-slab on the chip (f32 small + bf16 prod).
"""

import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from poet_tpu.ops.detection import _multiscale_roi_align_slab_batched  # noqa: E402
from poet_tpu.ops.roi_align_pallas import multiscale_roi_align_pallas  # noqa: E402


def make_inputs(B=16, R=1000, C=256, dtype=jnp.bfloat16, seed=0, half=False):
    rng = np.random.RandomState(seed)
    shapes = [(120, 160), (60, 80), (30, 40), (15, 20)]
    iw, ih = 640, 480
    if half:
        shapes = [(h // 2, w // 2) for h, w in shapes]
        iw, ih = 320, 240
    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(rng.randn(B, h, w, C), dtype) for h, w in shapes]
    # RPN-like boxes: log-uniform scales 8..400 px, aspect 1/3..3
    scale = np.exp(rng.uniform(np.log(8), np.log(min(400, ih)), (B, R)))
    ar = np.exp(rng.uniform(np.log(1 / 3), np.log(3), (B, R)))
    w = scale * np.sqrt(ar)
    h = scale / np.sqrt(ar)
    cx = rng.uniform(0, iw, (B, R))
    cy = rng.uniform(0, ih, (B, R))
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    boxes = np.clip(boxes, [0, 0, 0, 0], [iw, ih, iw, ih])
    return feats, strides, jnp.asarray(boxes, jnp.float32)


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    feats, strides, boxes = make_inputs()
    pallas_fn = jax.jit(lambda f, b: multiscale_roi_align_pallas(list(f), strides, b))
    slab_fn = jax.jit(lambda f, b: _multiscale_roi_align_slab_batched(list(f), strides, b))

    o1 = pallas_fn(tuple(feats), boxes)
    o2 = slab_fn(tuple(feats), boxes)
    d = np.abs(np.asarray(o1, np.float32) - np.asarray(o2, np.float32))
    ref = np.abs(np.asarray(o2, np.float32)).max()
    print(f"bf16 prod-scale max abs diff vs slab: {d.max():.4g} (ref max {ref:.3g})")

    # interleaved A/B
    for round_ in range(3):
        tp = timeit(pallas_fn, tuple(feats), boxes, reps=args.reps)
        ts = timeit(slab_fn, tuple(feats), boxes, reps=args.reps)
        print(f"round {round_}: pallas {tp:8.2f} ms   slab {ts:8.2f} ms   speedup {ts/tp:5.1f}x")

    # f32 numerics at a VMEM-fitting scale (half-size pyramid: ~6.5 MB f32)
    feats32, strides, boxes32 = make_inputs(B=2, R=200, C=256, seed=1, half=True)
    feats32 = [f.astype(jnp.float32) for f in feats32]
    o1 = multiscale_roi_align_pallas(feats32, strides, boxes32)
    o2 = _multiscale_roi_align_slab_batched(feats32, strides, boxes32)
    d = np.abs(np.asarray(o1) - np.asarray(o2))
    print(f"f32 on-chip max abs diff vs slab: {d.max():.4g}")


if __name__ == "__main__":
    main()
