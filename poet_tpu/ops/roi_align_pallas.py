"""Pallas RoIAlign: VMEM-resident FPN pyramid, per-box on-chip pooling.

TPU-native replacement for the XLA slab-gather MultiScaleRoIAlign
(`ops/detection.py:multiscale_roi_align_batched`) on the Mask R-CNN
detect+pose path (reference semantics: torchvision MultiScaleRoIAlign
driven by models/backbone_maskrcnn.py:59-116).

Why a kernel: the r3 profile of the slab path showed ~160 ms/iter of the
bs=16 detect+pose batch inside RoI-align — 70 ms of (window, C) slab
gathers re-fetching ~15 GB/iter of feature rows plus 62 ms of layout
copies XLA inserts between the gather fusions and the interpolation dots.
The kernel inverts the data movement: one image's ENTIRE 4-level FPN
pyramid is only ~13 MB in bf16 (levels (120,160), (60,80), (30,40),
(15,20) x 256ch at 480x640), so it is DMA'd into VMEM ONCE per image
(~210 MB/iter total, a 70x traffic reduction) and all 1000 proposals pool
from the resident copy:

  grid = (B, R/CB); at box-chunk 0 of each image the pyramid is copied
  HBM->VMEM (single-buffered: the ~19 us fill is <3% of the per-image
  compute). Per box, 14 bilinear y-samples are blended on the VPU from
  dynamically addressed row-pairs of the resident level and accumulated
  into the 7 output-row buckets of an (RX, 7*C) scratch; one MXU matmul
  against the precomputed x-weight operator (8, RX) then applies the
  whole x-interpolation + x-bin fold (torchvision's exact (1-frac, frac)
  corner weights, built in XLA and streamed per chunk).

Layout notes (the parts that make it fast):
  * levels are passed reshaped (B, H, W/8, 8, C) so the per-box x-window
    slice starts on a sublane-tile boundary — every dynamic offset lands
    on a MAJOR dim and the slice is pure addressing (no shift network).
    The x-window origin is rounded down to a multiple of 8 accordingly.
  * the x-window is per-level: RX_l = min(ceil8(W_l), 64). Levels
    narrower than 64 px are covered WHOLE (pooling there is exact for
    any box); on wider levels the window covers x-spans <= RX_l-9, i.e.
    aspect ratios up to ~3.9 at the level mapper's maximum box scale.
    Wider (sliver) boxes are re-pooled exactly by direct corner gathers
    (_repool_boxes_pointwise) under a while_loop over violation-ranked
    chunks of `wide_capacity` boxes — ZERO iterations when no box
    violates (the common case costs only the predicate), as many chunks
    as needed otherwise, so there is NO capacity bound on exactness.
  * per-box scalars (level, x-origin/8, 14 row indices + corner weights)
    arrive as small SMEM blocks — no scalar-prefetch arrays, no SMEM
    pressure; the pyramid DMA addresses depend only on program_id.

Gradients: none (inference-only by design — the reference freezes the
detector, models/backbone.py:36-40; RoIAlign never sees a training
gradient). Differentiating through this op raises at trace time.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RX_MAX = 64      # max x-window (feature px); multiple of 8
# boxes per grid step. More boxes per program amortize the per-program
# entry/exit overhead of the (B, R/CB) grid (at R=1000, CB=8 means 2000
# program activations per batch); the only cost is a bigger output block
# (CB * Mo * Mo * Cp * itemsize VMEM). Env-tunable for on-chip A/Bs.
_CB = int(os.environ.get("POET_ROI_CB", "8"))


def _ceil8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _level_rx(W: int) -> int:
    return min(_ceil8(W), _RX_MAX)


def _kernel(*refs, L, out_size, s, rx_levels, Cp, dt):
    """refs = [lvl_hbm x L, iyl, irx8, ilv, yw0, yw1, ax, out,
               scr x L, sr, sems]."""
    N = out_size * s
    lvl_hbm = refs[:L]
    iyl_ref, irx8_ref, ilv_ref, yw0_ref, yw1_ref, ax_ref = refs[L:L + 6]
    out_ref = refs[L + 6]
    scr = refs[L + 7:2 * L + 7]
    sr_ref = refs[2 * L + 7]
    sems = refs[2 * L + 8]

    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        for l in range(L):
            pltpu.make_async_copy(lvl_hbm[l].at[b], scr[l], sems.at[l]).start()
        for l in range(L):
            pltpu.make_async_copy(lvl_hbm[l].at[b], scr[l], sems.at[l]).wait()

    def box_body(i, carry):
        lv = ilv_ref[0, 0, i]
        rx8 = irx8_ref[0, 0, i]
        Mo = out_ref.shape[2]
        # output rows beyond out_size are padding: write zeros (the 8x8
        # padded-output mode feeds zero-padded fc6 weights, so every pad
        # position must be a defined zero, never uninitialized VMEM)
        for oy in range(out_size, Mo):
            out_ref[0, i, oy] = jnp.zeros((Mo, Cp), out_ref.dtype)
        for l in range(L):

            @pl.when(lv == l)
            def _(l=l):
                RXl = rx_levels[l]
                R8 = RXl // 8
                for oy in range(out_size):
                    acc = None
                    for k in range(s):
                        n = oy * s + k
                        yl = iyl_ref[0, 0, i * N + n]
                        w0 = yw0_ref[0, 0, i * N + n].astype(dt)
                        w1 = yw1_ref[0, 0, i * N + n].astype(dt)
                        pair = scr[l][pl.ds(yl, 2), pl.ds(rx8, R8)]
                        p0 = pair[0].reshape(RXl, Cp)
                        p1 = pair[1].reshape(RXl, Cp)
                        t = p0 * w0 + p1 * w1
                        acc = t if acc is None else acc + t
                    sr_ref[0:RXl, oy * Cp:(oy + 1) * Cp] = acc
                axl = ax_ref[0, i, :, :RXl]
                # f32 inputs request full-precision MXU passes (default
                # reduced precision measured ~1e-2 abs error on-chip vs the
                # exact oracle); bf16 operands keep the native fast path —
                # same policy as deform_attn_pallas_v3._dot
                prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
                        else jax.lax.Precision.DEFAULT)
                outm = jnp.dot(axl, sr_ref[0:RXl, :],
                               preferred_element_type=jnp.float32,
                               precision=prec)
                for oy in range(out_size):
                    out_ref[0, i, oy] = outm[:, oy * Cp:(oy + 1) * Cp].astype(
                        out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, _CB, box_body, 0)


def _repool_boxes_pointwise(features, strides, boxes_w, output_size,
                            sampling_ratio, canonical_scale, canonical_level,
                            levels=None):
    """Exact torchvision pooling of a SMALL (B, Kw) box set via direct
    4-corner point gathers -> (B, Kw, out, out, C).

    The x-window violators are at most `wide_capacity` boxes per image, so
    re-pooling them through the full slab machinery (one flat table of
    every level row, ~10 ms/iter of pad/copy/relayout fusions in the r4
    detect+pose profile) is absurd: a handful of boxes needs a few thousand
    gathered corner points. Each listed level gathers corners for ALL wide
    boxes (indices clipped into that level) and a level-equality mask
    selects the assigned level's contribution.

    `levels` restricts the gather to the listed feature indices — callers
    re-pooling x-window violators pass only the VIOLABLE levels (those
    wider than their window; a violator is by definition assigned to one).
    Boxes assigned to unlisted levels come back as zeros and must be
    masked out by the caller."""
    from poet_tpu.ops import detection as det

    B, Kw = boxes_w.shape[:2]
    C = features[0].shape[-1]
    shapes = [(f.shape[1], f.shape[2]) for f in features]
    bf = boxes_w.reshape(B * Kw, 4)
    lvl, H_arr, W_arr, _, inv_stride = det._roi_level_geometry(
        shapes, strides, bf, canonical_scale, canonical_level)
    s = sampling_ratio
    N = output_size * s
    ii = jnp.arange(output_size, dtype=jnp.float32)
    kk = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    grid = (ii[:, None] + kk[None, :]).reshape(N)
    boxes_lvl = bf.astype(jnp.float32) * inv_stride[lvl][:, None]
    xlo, xfrac, x_out, ylo, yfrac, y_out = det._roi_sample_coords(
        boxes_lvl, grid, output_size, H_arr[lvl], W_arr[lvl])

    wy0 = ((1.0 - yfrac) * ~y_out).reshape(B, Kw, N, 1, 1)
    wy1 = (yfrac * ~y_out).reshape(B, Kw, N, 1, 1)
    wx0 = ((1.0 - xfrac) * ~x_out).reshape(B, Kw, 1, N, 1)
    wx1 = (xfrac * ~x_out).reshape(B, Kw, 1, N, 1)

    acc = jnp.zeros((B, Kw, N, N, C), jnp.float32)
    for li, f in enumerate(features):
        if levels is not None and li not in levels:
            continue
        H, W = shapes[li]
        yl = jnp.clip(ylo, 0, H - 2).reshape(B, Kw, N)
        xl = jnp.clip(xlo, 0, W - 2).reshape(B, Kw, N)

        def one(fb, ylb, xlb):
            g00 = fb[ylb[:, :, None], xlb[:, None, :]]       # (Kw, N, N, C)
            g01 = fb[ylb[:, :, None], xlb[:, None, :] + 1]
            g10 = fb[ylb[:, :, None] + 1, xlb[:, None, :]]
            g11 = fb[ylb[:, :, None] + 1, xlb[:, None, :] + 1]
            return g00, g01, g10, g11

        g00, g01, g10, g11 = jax.vmap(one)(f, yl, xl)
        val = (g00.astype(jnp.float32) * (wy0 * wx0)
               + g01.astype(jnp.float32) * (wy0 * wx1)
               + g10.astype(jnp.float32) * (wy1 * wx0)
               + g11.astype(jnp.float32) * (wy1 * wx1))
        sel = (lvl.reshape(B, Kw) == li)[:, :, None, None, None]
        acc = acc + jnp.where(sel, val, 0.0)

    out = acc.reshape(B, Kw, output_size, s, output_size, s, C).mean((3, 5))
    return out.astype(features[0].dtype)


def multiscale_roi_align_pallas(
    features: Sequence[jnp.ndarray],   # per level (B, H_l, W_l, C)
    strides: Sequence[int],
    boxes: jnp.ndarray,                # (B, R, 4) xyxy image coords
    output_size: int = 7,
    sampling_ratio: int = 2,
    canonical_scale: int = 224,
    canonical_level: int = 4,
    wide_capacity: int = None,
    interpret: bool = False,
    padded_output: bool = False,
) -> jnp.ndarray:
    """torchvision MultiScaleRoIAlign -> (B, R, out, out, C); see module doc.

    padded_output=True returns the kernel's native padded block
    (B, R, Mo, Mo, Cp) with Mo = out rounded up to 8 and Cp the padded
    channel count, every pad position an exact zero — callers flatten it
    straight into zero-padded head weights, skipping the 7x7xC slice +
    NCHW transpose copies (~4 ms/iter of the r4 detect+pose profile)."""
    from poet_tpu.ops import detection as det

    if wide_capacity is None:
        # chunk width of the exact wide-box re-pool loop (exactness never
        # depends on it — only how many loop iterations a violator-heavy
        # batch takes). Env-tunable for A/Bs; real RPN distributions have
        # ~zero violators, random-weight benches can have dozens.
        wide_capacity = int(os.environ.get("POET_ROI_WIDE_CAP", "4"))
    B, R = boxes.shape[:2]
    C = features[0].shape[-1]
    dt = features[0].dtype
    L = len(features)
    if R == 0:
        return jnp.zeros((B, 0, output_size, output_size, C), dt)
    shapes = [(f.shape[1], f.shape[2]) for f in features]
    for li, (h, w_) in enumerate(shapes):
        if min(h, w_) < 2:
            raise ValueError(
                f"multiscale_roi_align: level {li} is {h}x{w_};"
                " every pyramid level needs H >= 2 and W >= 2 for bilinear"
                " corner gathers")

    Cp = max(_ceil8(C), ((C + 127) // 128) * 128)
    rx_levels = tuple(_level_rx(w_) for _, w_ in shapes)
    Wp = [max(_ceil8(w_), rx_levels[li]) for li, (_, w_) in enumerate(shapes)]

    # ---- geometry (shared torchvision-semantics helpers) -------------------
    boxes_flat = boxes.reshape(B * R, 4)
    lvl, H_arr, W_arr, _, inv_stride = det._roi_level_geometry(
        shapes, strides, boxes_flat, canonical_scale, canonical_level)
    s = sampling_ratio
    N = output_size * s
    ii = jnp.arange(output_size, dtype=jnp.float32)
    kk = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    grid = (ii[:, None] + kk[None, :]).reshape(N)
    boxes_lvl = boxes_flat.astype(jnp.float32) * inv_stride[lvl][:, None]
    xlo, xfrac, x_out, ylo, yfrac, y_out = det._roi_sample_coords(
        boxes_lvl, grid, output_size, H_arr[lvl], W_arr[lvl])

    RX_arr = jnp.asarray(rx_levels, jnp.int32)[lvl]            # (BR,)
    Wp_arr = jnp.asarray(Wp, jnp.int32)[lvl]
    rx0 = jnp.clip(jnp.minimum(xlo[:, 0], Wp_arr - RX_arr), 0)
    rx0 = (rx0 // 8) * 8                                       # sublane-align
    over = jnp.maximum(xlo[:, -1] + 1 - (rx0 + RX_arr - 1), 0)

    # y corner weights per sample (bucket 1/s fold + outside mask included)
    ymask = (~y_out).astype(jnp.float32) / s
    yw0 = (1.0 - yfrac) * ymask                                # (BR, N)
    yw1 = yfrac * ymask

    # x operator (8, RX_MAX): torchvision corner weights, s-sample fold
    iota = jnp.arange(_RX_MAX)
    pos = xlo - rx0[:, None]                                   # (BR, N)
    one_lo = (iota[None, None, :] == pos[..., None]).astype(jnp.float32)
    one_hi = (iota[None, None, :] == pos[..., None] + 1).astype(jnp.float32)
    xw = one_lo * (1.0 - xfrac[..., None]) + one_hi * xfrac[..., None]
    xw = xw * (~x_out)[..., None].astype(jnp.float32)
    ax = xw.reshape(B * R, output_size, s, _RX_MAX).mean(2)    # (BR, 7, RX)
    ax = jnp.pad(ax, ((0, 0), (0, 8 - output_size % 8 if output_size % 8 else 0),
                      (0, 0)))
    Mo = ax.shape[1]
    ax = ax.astype(dt)

    # ---- chunked per-box streams -------------------------------------------
    NC = -(-R // _CB)
    Rp = NC * _CB
    pad = Rp - R

    def pk(x, fill=0):
        x = x.reshape(B, R, -1)
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), constant_values=fill)
        return x.reshape(B * NC, 1, -1)                        # (B*NC,1,CB*k)

    iyl = pk(ylo)                                              # (B*NC, CB*N)
    fw0 = pk(yw0)
    fw1 = pk(yw1)
    irx8 = pk(rx0 // 8)                                        # (B*NC, CB)
    ilv = pk(lvl)
    axs = jnp.pad(ax.reshape(B, R, Mo, _RX_MAX),
                  ((0, 0), (0, pad), (0, 0), (0, 0))
                  ).reshape(B * NC, _CB, Mo, _RX_MAX)

    feats = []
    for li, f in enumerate(features):
        H, W = shapes[li]
        f = jnp.pad(f, ((0, 0), (0, 0), (0, Wp[li] - W), (0, Cp - C)))
        feats.append(f.reshape(B, H, Wp[li] // 8, 8, Cp))

    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    kern = functools.partial(
        _kernel, L=L, out_size=output_size, s=s, rx_levels=rx_levels,
        Cp=Cp, dt=dt)
    out = pl.pallas_call(
        kern,
        grid=(B, NC),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * L + [
            smem((1, 1, _CB * N), lambda b, j: (b * NC + j, 0, 0)),   # iyl
            smem((1, 1, _CB), lambda b, j: (b * NC + j, 0, 0)),       # irx8
            smem((1, 1, _CB), lambda b, j: (b * NC + j, 0, 0)),       # ilv
            smem((1, 1, _CB * N), lambda b, j: (b * NC + j, 0, 0)),   # yw0
            smem((1, 1, _CB * N), lambda b, j: (b * NC + j, 0, 0)),   # yw1
            vmem((1, _CB, Mo, _RX_MAX), lambda b, j: (b * NC + j, 0, 0, 0)),
        ],
        out_specs=vmem((1, _CB, Mo, Mo, Cp),
                       lambda b, j: (b * NC + j, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * NC, _CB, Mo, Mo, Cp), dt),
        scratch_shapes=[
            pltpu.VMEM((shapes[li][0], Wp[li] // 8, 8, Cp), dt)
            for li in range(L)
        ] + [
            pltpu.VMEM((_RX_MAX, output_size * Cp), dt),
            pltpu.SemaphoreType.DMA((L,)),
        ],
        interpret=interpret,
    )(*feats, iyl, irx8, ilv, fw0, fw1, axs)

    out = out.reshape(B, Rp, Mo, Mo, Cp)[:, :R]
    if not padded_output:
        out = out[:, :, :output_size, :output_size, :C]        # (B,R,o,o,C)

    def pad_block(x):
        """(B?, R?, o, o, C) -> the kernel's padded (Mo, Mo, Cp) block."""
        if not padded_output:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, Mo - output_size),
                           (0, Mo - output_size), (0, Cp - C)))

    # ---- exact re-pool of x-window violators ------------------------------
    # A lax.while_loop processes violators in chunks of `wide_capacity`
    # boxes per image, ranked by violation amount, until EVERY violator is
    # exactly re-pooled via direct corner gathers — no capacity bound
    # (VERDICT r3 next #7: box #17+ is now a second loop iteration, not a
    # silently clipped window). The common case (no violators — the level
    # mapper needs aspect ratios >~15 to produce one) runs ZERO iterations
    # and costs only the predicate; the loop carry aliases `out` in place,
    # unlike a lax.cond whose big-tensor pass-through branch materializes a
    # full copy (measured 1.6 ms/iter on the bs=16 detect+pose batch).
    W0 = max(w_ for _, w_ in shapes)
    if wide_capacity > 0 and W0 > _RX_MAX - 8:
        Kw = min(wide_capacity, R)
        # only levels wider than their x-window can host a violator
        violable = [li for li, (_, w_) in enumerate(shapes)
                    if w_ > rx_levels[li] - 8]
        over_im = over.reshape(B, R)
        order = jnp.argsort(-over_im, axis=1)                  # (B, R)
        over_sorted = jnp.take_along_axis(over_im, order, axis=1)
        n_wide_max = jnp.max(jnp.sum(over_im > 0, axis=1))
        n_chunks = (n_wide_max + Kw - 1) // Kw
        bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
        # chunk-overrun padding uses the out-of-range index R so the final
        # scatter drops pad entries instead of aliasing box 0 (a duplicate
        # index 0 in one scatter would make the box-0 re-pool write-order
        # dependent); gathers through R clamp, which is harmless since the
        # gathered values are dropped at the scatter
        order_pad = jnp.pad(order, ((0, 0), (0, Kw)), constant_values=R)
        over_pad = jnp.pad(over_sorted, ((0, 0), (0, Kw)))

        def chunk_body(carry):
            i, acc = carry
            wide_i = jax.lax.dynamic_slice_in_dim(order_pad, i * Kw, Kw, axis=1)
            wide_over = jax.lax.dynamic_slice_in_dim(over_pad, i * Kw, Kw,
                                                     axis=1)   # (B, Kw)
            wide_boxes = jnp.take_along_axis(boxes, wide_i[..., None], axis=1)
            out_w = _repool_boxes_pointwise(
                features, strides, wide_boxes, output_size, sampling_ratio,
                canonical_scale, canonical_level,
                levels=violable)                               # (B, Kw, o, o, C)
            # only true violators are overwritten: chunk padding (and boxes
            # on non-violable levels, which the restricted gather returns as
            # zeros) keep their in-kernel values
            keep = acc[bidx, wide_i]
            vals = jnp.where((wide_over > 0)[..., None, None, None],
                             pad_block(out_w), keep)
            return i + 1, acc.at[bidx, wide_i].set(vals, mode="drop")

        out = jax.lax.while_loop(
            lambda c: c[0] < n_chunks, chunk_body, (jnp.int32(0), out))[1]
    return out
