"""Fused separable Pallas kernel for multi-scale deformable attention (v3).

Same contract and numerics as `ms_deform_attn_xla` / `ms_deform_attn_sep`
(the TPU replacement for the reference's MSDeformAttn CUDA op, imported at
models/deformable_transformer.py:24) — but the separable formulation's big
intermediate never leaves VMEM.

Why v3 exists — the measured gap in `sep` (ops/deform_attn.py): XLA lowers
the x-mix einsum well (convolution-base-dilated on the MXU) but MATERIALIZES
the (B, Q, H, P, Hl, D) intermediate `g` to HBM and reads it back for the
y-mix reduction fusion (level-0 y-mix alone: 2.0 ms of the measured 5.4
ms/layer at the paper config — pure HBM traffic, ~1.6 GB each way in bf16).
Fusing the y-mix into the x-mix is exactly what a kernel can do and XLA
cannot (fusion does not cross a dot boundary): per query tile, `g` lives in
VMEM and is consumed immediately.

Layout is the whole trick (and where v1/v2 lost). Everything is TRANSPOSED
relative to `sep` so that each Mosaic op lands on its fast path:

  * queries live in LANES (tiles of Qt=128 — one full vreg lane dim),
  * the x-mix is  gT = vT_l[h] @ bxT_p  with vT_l (Hl*D, Wl) sublane-major
    (y*D + d) and bxT (Wl, Qt): plain MXU dot, K = Wl,
  * the y-mix reduction over y is then a SUBLANE-group reduction:
    gT.reshape(Hl, D, Qt) * ay[:, None, :] summed over axis 0 — a free
    reinterpretation (480 = 30*16 splits on a sublane-tile boundary) plus
    vreg adds; no lane shuffles, no block-identity matmul (v2's mistake),
    no (y,d)-interleaved lane reshapes,
  * the P=4 points accumulate into the same (D, Qt) register block, so the
    p-sum costs nothing.

Zero-padding semantics are identical to the XLA reference: an out-of-map
corner index matches no iota row, so its weight is implicitly zero; query
padding uses location -10 which matches nothing.

Forward + custom VJP. The backward applies the same fusion to the adjoint:
d_value accumulates per level as bxT-weighted outer products (a K=Qt MXU
matmul — full K utilization), and d_loc/d_attn recompute gT (free remat in
VMEM) plus a second x-mix against the one-hot DIFFERENCE operator; none of
autodiff's g-sized HBM round-trips survive.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32

_QT = 128  # query lane tile


def _dot(a, b, dims, dtype):
    """dot_general with full f32 precision when the operands are f32.

    On TPU the MXU's default precision for f32 operands is reduced (bf16
    passes) — measured 2.6e-3 absolute error vs the XLA reference at encoder
    shapes. bf16 operands are exact by construction (native MXU dtype with
    f32 accumulation), so they keep the fast path. The accumulator must be
    f32: Mosaic verifies `tpu.matmul` acc is 32-bit, so a bf16 consumer
    casts the result explicitly (vreg pack ops) rather than asking the MXU
    to emit bf16.
    """
    precision = (jax.lax.Precision.HIGHEST if dtype == _F32
                 else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(a, b, dimension_numbers=dims,
                               preferred_element_type=_F32,
                               precision=precision)


def _pick_head_group(H, D, spatial_shapes, bytes_per_elem,
                     budget=8 * 1024 * 1024):
    """Largest divisor of H whose per-group value-shaped VMEM blocks fit.

    The value-shaped blocks are (Hg, Hl*D, Wl) per level with the lane dim
    padded to 128. `bytes_per_elem` is the TOTAL bytes each value element
    costs in VMEM across all simultaneously-resident value-shaped buffers:
    the forward holds only vT (itemsize); the fused adjoint holds vT +
    the d_value output block (itemsize each) + the f32 accumulation scratch
    (4 bytes), so ~3x/4x the forward's footprint — sized separately or the
    merged backward oversubscribes the 16 MB scoped VMEM at full H=16
    (which the forward-only budget measured fine: all heads fit at rcnn
    scale, while YOLO scale overflowed at 29.25M requested and needs
    grid-partitioned head groups).
    """
    per_head = sum(Hl * D * (-(-Wl // 128) * 128) * bytes_per_elem
                   for Hl, Wl in spatial_shapes)
    for hg in range(H, 0, -1):
        if H % hg == 0 and per_head * hg <= budget:
            return hg
    return 1


def _prep_value(value, spatial_shapes):
    """value (B, S, H, D) -> per-level vT (B, H, Hl*D, Wl), sublane y*D+d."""
    B, S, H, D = value.shape
    vT_levels = []
    start = 0
    for Hl, Wl in spatial_shapes:
        v = value[:, start : start + Hl * Wl].reshape(B, Hl, Wl, H, D)
        start += Hl * Wl
        vT_levels.append(v.transpose(0, 3, 1, 4, 2).reshape(B, H, Hl * D, Wl))
    return vT_levels


def _prep(value, spatial_shapes, sampling_locations, attention_weights):
    """Host-side (XLA) layout prep shared by fwd and bwd.

    Returns (vT_levels, locT, attnT, Q_pad) with
      vT_levels[l]: (B, H, Hl*D, Wl)   sublane index y*D + d, lane x,
      locT:         (B, H*L*P*2, Q_pad) f32 NORMALIZED locations, row order
                    (h, l, p, coord) — the raw feature order of the
                    sampling-offsets projection (pad queries = -10),
      attnT:        (B, H*L*P, Q_pad)  f32 attention weights.

    Layout strategy (r4): the coords reach the kernel as ONE true Q-minor
    relayout each (pad on the cheap major Q axis first); the per-level
    pixel scaling (loc*W_l - 0.5) happens IN-KERNEL on (1, Qt) tiles —
    2 VPU ops per row read, free. Every earlier variant that materialized
    per-level scaled (…, Q) coord tensors in XLA paid ~10 ms/iter of
    strided-layout writes at YOLO scale (S=6380), whichever axis order the
    stack used — there is no good XLA-side layout for a 5-D tensor with
    three tiny middle axes; a flat (B, F, Q) matrix sidesteps it.
    """
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape

    vT_levels = _prep_value(value, spatial_shapes)

    Q_pad = ((Q + _QT - 1) // _QT) * _QT
    loc2 = sampling_locations.astype(_F32).reshape(B, Q, H * L * P * 2)
    attn2 = attention_weights.astype(_F32).reshape(B, Q, H * L * P)
    if Q_pad != Q:
        qpad = ((0, 0), (0, Q_pad - Q), (0, 0))
        # -10 normalized location scales to -10*W - 0.5: matches nothing
        loc2 = jnp.pad(loc2, qpad, constant_values=-10.0)
        attn2 = jnp.pad(attn2, qpad)
    locT = loc2.transpose(0, 2, 1)          # (B, H*L*P*2, Q_pad)
    attnT = attn2.transpose(0, 2, 1)        # (B, H*L*P,   Q_pad)
    return vT_levels, locT, attnT, Q_pad


def _corner_ops(x_p, y_p, a_p, Hl, Wl, Qt):
    """Build the transposed one-hot operators for one point.

    x_p, y_p, a_p: (1, Qt) f32 pixel coords / attention weight.
    Returns (bxT, dbxT, ayT, wyT, dwyT):
      bxT  (Wl, Qt): x-interpolation operator (two weighted one-hot rows),
      dbxT (Wl, Qt): d bxT / d tx  (one-hot difference),
      ayT  (Hl, Qt): y operator * attention weight,
      wyT  (Hl, Qt): y operator without attention,
      dwyT (Hl, Qt): d wyT / d ty.
    """
    x0 = jnp.floor(x_p)
    y0 = jnp.floor(y_p)
    tx = x_p - x0
    ty = y_p - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    iota_x = lax.broadcasted_iota(jnp.int32, (Wl, Qt), 0)
    iota_y = lax.broadcasted_iota(jnp.int32, (Hl, Qt), 0)
    oh_x0 = (iota_x == x0i).astype(_F32)
    oh_x1 = (iota_x == x0i + 1).astype(_F32)
    oh_y0 = (iota_y == y0i).astype(_F32)
    oh_y1 = (iota_y == y0i + 1).astype(_F32)

    bxT = oh_x0 * (1.0 - tx) + oh_x1 * tx
    dbxT = oh_x1 - oh_x0
    wyT = oh_y0 * (1.0 - ty) + oh_y1 * ty
    dwyT = oh_y1 - oh_y0
    return bxT, dbxT, wyT * a_p, wyT, dwyT


def _interp_ops(x_p, y_p, a_p, Hl, Wl, Qt):
    """Interpolation operators via hat functions (forward / d_value only).

    bxT[i, q] = relu(1 - |i - x_q|) is bit-identical to _corner_ops' two
    weighted one-hot rows: for the two in-support rows, |i - x| equals tx /
    1-tx exactly (the subtraction against a nearby integer is Sterbenz-exact
    at feature-map magnitudes), and every other row is clamped to 0 — same
    zero-padding semantics for out-of-map and -10-padded queries. The win is
    VPU ops on the BIG (Wl, Qt)/(Hl, Qt) tiles: 3 per operator (sub+abs
    fuse) vs the one-hot build's ~7 (2 compares, 2 converts, 2 muls, 1 add).
    The d_loc/d_attn kernels keep _corner_ops: they need the one-hot
    DIFFERENCE operators, whose comparisons price bxT at 3 extra vops anyway.
    """
    if os.environ.get("POET_V3_INTERP") == "onehot":   # A/B escape hatch
        ops = _corner_ops(x_p, y_p, a_p, Hl, Wl, Qt)
        return ops[0], ops[2]
    # Mosaic's tpu.iota is integer-only; the converts CSE across points.
    iota_x = lax.broadcasted_iota(jnp.int32, (Wl, Qt), 0).astype(_F32)
    iota_y = lax.broadcasted_iota(jnp.int32, (Hl, Qt), 0).astype(_F32)
    bxT = jnp.maximum(1.0 - jnp.abs(iota_x - x_p), 0.0)
    ayT = a_p * jnp.maximum(1.0 - jnp.abs(iota_y - y_p), 0.0)
    return bxT, ayT


def _coord_rows(loc_ref, attn_ref, h, lvl, P, spatial_shapes):
    """Per-point (1, Qt) pixel coords + attention weight from the flat
    (F, Qt) coordinate blocks; the level scaling happens here (Python-float
    constants, 2 VPU ops per row)."""
    L = len(spatial_shapes)
    Hl, Wl = spatial_shapes[lvl]
    out = []
    for p in range(P):
        row = ((h * L + lvl) * P + p) * 2
        x = loc_ref[0, row : row + 1] * float(Wl) - 0.5
        y = loc_ref[0, row + 1 : row + 2] * float(Hl) - 0.5
        a = attn_ref[0, row // 2 : row // 2 + 1]
        out.append((x, y, a))
    return out


def _fwd_kernel(loc_ref, attn_ref, *rest, spatial_shapes, H, D, dtype,
                ymix_bf16):
    vT_refs = rest[:-1]
    out_ref = rest[-1]
    Qt = out_ref.shape[-1]
    # bf16 path (opt-in POET_V3_YMIX_BF16=1): run the y-mix multiply/reduce
    # in packed bf16 (16 sublanes/vreg, half the vector ops of f32).
    # Numerically safe: the y-operator has exactly two nonzero rows per
    # query, so the bf16 "accumulation" over Hl adds two products and zeros.
    # MEASURED SLOWER on v5e (bench.py A/B 2026-08-19: 533 vs 597 img/s with
    # f32 y-mix) — the pack/unpack converts outweigh the vop halving at these
    # tile shapes, so f32 is the default. Kept as a documented experiment.
    g_dtype = jnp.bfloat16 if ymix_bf16 else _F32

    P = loc_ref.shape[1] // (len(spatial_shapes) * H * 2)

    def head_body(h, _):
        acc = jnp.zeros((D, Qt), _F32)
        for lvl, (Hl, Wl) in enumerate(spatial_shapes):
            vT = vT_refs[lvl][0, h]                      # (Hl*D, Wl)
            pts = _coord_rows(loc_ref, attn_ref, h, lvl, P, spatial_shapes)
            ops = [_interp_ops(x, y, a, Hl, Wl, Qt) for x, y, a in pts]
            # one (Hl*D, Wl) @ (Wl, P*Qt) dot for all points: the lane
            # concat is 128-aligned (Qt = 128), and N = P*Qt amortizes the
            # MXU pipeline fill that four N=Qt dots pay separately.
            bxT_all = jnp.concatenate([o[0] for o in ops], axis=1)
            gT_all = _dot(vT, bxT_all.astype(dtype),
                          (((1,), (0,)), ((), ())), dtype)  # (Hl*D, P*Qt) f32
            # pack once (2 f32 vregs -> 1 bf16 vreg), then every per-point
            # y-mix op below runs at half the vop count: net ~25% fewer
            # vops than the f32 y-mix even counting the pack pass.
            gT_all = gT_all.astype(g_dtype)
            for p in range(P):
                gT = gT_all[:, p * Qt : (p + 1) * Qt]
                part = jnp.sum(
                    gT.reshape(Hl, D, Qt)
                    * ops[p][1].astype(g_dtype)[:, None, :], axis=0)
                acc = acc + part.astype(_F32)
        out_ref[0, h] = acc.astype(out_ref.dtype)
        return 0

    # static unroll over heads: measured 3.62 vs 3.95 ms/layer with a
    # fori_loop at the paper config (Mosaic schedules across iterations)
    for h in range(H):
        head_body(h, 0)


def ms_deform_attn_pallas_v3(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Fused separable deformable sampling (forward). See module docstring.

    Args/returns exactly as `ms_deform_attn_xla`:
      value (B, S, H, D), spatial_shapes static [(Hl, Wl)] with sum(Hl*Wl)==S,
      sampling_locations (B, Q, H, L, P, 2) in [0,1], attention_weights
      (B, Q, H, L, P) -> (B, Q, H*D).
    """
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    assert sum(h * w for h, w in spatial_shapes) <= S  # trailing pad tokens OK

    vT_levels, locT, attnT, Q_pad = _prep(
        value, spatial_shapes, sampling_locations, attention_weights)
    out = _fwd_core(vT_levels, locT, attnT, spatial_shapes,
                    value.dtype)                         # (B, H, D, Q_pad)
    out = out.transpose(0, 3, 1, 2)[:, :Q]               # (B, Q, H, D)
    return out.reshape(B, Q, H * D).astype(value.dtype)


def _fwd_core(vT_levels, locT, attnT, spatial_shapes, dtype, out_dtype=None):
    """The forward pallas_call on already-staged operands.

    vT_levels per (B, H, Hl*D, Wl); locT (B, H*L*P*2, Q_pad) f32 raw
    normalized; attnT (B, H*L*P, Q_pad) f32 -> (B, H, D, Q_pad) in
    `out_dtype` (default f32 — the T2 entry asks for value.dtype so the
    f32->bf16 cast happens in-kernel on the VMEM accumulator instead of as
    a separate XLA convert pass over the full output)."""
    B, H = vT_levels[0].shape[:2]
    D = vT_levels[0].shape[2] // spatial_shapes[0][0]
    L = len(spatial_shapes)
    P = attnT.shape[1] // (H * L)
    Q_pad = locT.shape[2]
    n_qt = Q_pad // _QT
    Hg = _pick_head_group(H, D, spatial_shapes, jnp.dtype(dtype).itemsize)

    grid = (B, H // Hg, n_qt)
    loc_spec = pl.BlockSpec(
        (1, Hg * L * P * 2, _QT), lambda b, g, q: (b, g, q),
        memory_space=pltpu.VMEM)
    attn_spec = pl.BlockSpec(
        (1, Hg * L * P, _QT), lambda b, g, q: (b, g, q),
        memory_space=pltpu.VMEM)
    v_specs = [
        pl.BlockSpec((1, Hg, Hl * D, Wl), lambda b, g, q: (b, g, 0, 0),
                     memory_space=pltpu.VMEM)
        for Hl, Wl in spatial_shapes
    ]
    ymix_bf16 = (dtype == jnp.bfloat16
                 and os.environ.get("POET_V3_YMIX_BF16", "0") == "1")
    return pl.pallas_call(
        functools.partial(_fwd_kernel, spatial_shapes=spatial_shapes,
                          H=Hg, D=D, dtype=dtype,
                          ymix_bf16=ymix_bf16),
        grid=grid,
        in_specs=[loc_spec, attn_spec, *v_specs],
        out_specs=pl.BlockSpec((1, Hg, D, _QT), lambda b, g, q: (b, g, 0, q),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, D, Q_pad), out_dtype or _F32),
    )(locT, attnT, *vT_levels)


# ---------------------------------------------------------------------------
# Custom VJP: the same fusion applied to the adjoint.
# ---------------------------------------------------------------------------


def _bwd_kernel(loc_ref, attn_ref, do_ref, *rest,
                spatial_shapes, H, D, dtype, n_qt, ymix_bf16):
    """Fused adjoint: d_value, d_loc (pixel-space d_tx/d_ty) and d_attn in
    ONE kernel. Merging the former separate d_value / d_loc kernels shares
    the corner-operator construction and the g-recompute dot (each was built
    twice) and reads the coord/cotangent blocks once. The two-kernel adjoint
    measured 8.1 ms/layer at the paper config (train-step xplane profile);
    the shared work bounds the merged kernel's win at roughly a third.

      gT / dgxT  = vT @ [bxT | dbxT]          (one MXU dot, K = Wl)
      d_value:   dvT[(y,d), x] += Σ_{q,p} ay[p,y,q]·dout[d,q]·bxT[x,q]
                 — a K = P*Qt dot with the point-sum built in, accumulated
                 over the q grid axis in an f32 VMEM scratch and written to
                 the (possibly bf16) output once, at the last q step.
      E[y, q]    = Σ_d gT · dout              (VPU sublane-group reduce)
      d_attn     = Σ_y wyT · E
      d_ty       = a · Σ_y dwyT · E
      d_tx       = Σ_y ay · (Σ_d dgxT · dout)
    """
    L = len(spatial_shapes)
    vT_refs = rest[:L]
    dv_refs = rest[L : 2 * L]
    dloc_ref, da_ref = rest[2 * L : 2 * L + 2]
    dv_accs = rest[2 * L + 2 : 3 * L + 2]     # f32 VMEM scratch per level
    q_idx = pl.program_id(2)
    P = loc_ref.shape[1] // (L * H * 2)
    Qt = do_ref.shape[-1]

    # packed-bf16 dg construction: same trick as the forward's y-mix (the
    # ay row-operator has two nonzero rows, so bf16 products lose one
    # rounding, and the d_value dot accumulates f32 inside the MXU anyway).
    dg_dtype = jnp.bfloat16 if ymix_bf16 else _F32

    def head_body(h, _):
        do = do_ref[0, h]                                # (D, Qt) f32
        do_g = do.astype(dg_dtype)
        for lvl, (Hl, Wl) in enumerate(spatial_shapes):
            vT = vT_refs[lvl][0, h]                      # (Hl*D, Wl)
            pts = _coord_rows(loc_ref, attn_ref, h, lvl, P, spatial_shapes)
            ops = [_corner_ops(x, y, a, Hl, Wl, Qt) for x, y, a in pts]
            # one dot for all points' gT AND dgxT: lane-concat the bx and
            # difference operators into (Wl, 2*P*Qt).
            bx_cat = jnp.concatenate(
                [o[0] for o in ops] + [o[1] for o in ops], axis=1)
            g_cat = _dot(vT, bx_cat.astype(dtype),
                         (((1,), (0,)), ((), ())), dtype)  # (Hl*D, 2*P*Qt)

            # ---- d_value (accumulated over the q grid axis in f32) ----
            # dg[(y,d), q] = ay[y, q] * dout[d, q]   (VMEM only)
            dg_all = jnp.concatenate(
                [(o[2].astype(dg_dtype)[:, None, :]
                  * do_g[None, :, :]).reshape(Hl * D, Qt)
                 for o in ops], axis=1)                  # (Hl*D, P*Qt)
            acc = _dot(dg_all.astype(dtype),
                       bx_cat[:, : P * Qt].astype(dtype),
                       (((1,), (1,)), ((), ())), dtype)  # (Hl*D, Wl)

            @pl.when(q_idx == 0)
            def _init():
                dv_accs[lvl][h] = acc

            @pl.when(q_idx != 0)
            def _accum():
                dv_accs[lvl][h] += acc

            @pl.when(q_idx == n_qt - 1)
            def _emit():
                dv_refs[lvl][0, h] = dv_accs[lvl][h].astype(dv_refs[lvl].dtype)

            # ---- d_loc / d_attn (per q tile; d_loc carries the loc->pixel
            # chain rule *W_l / *H_l so the wrapper needs no per-level pass)
            for p in range(P):
                _, _, ayT, wyT, dwyT = ops[p]
                a = pts[p][2]
                row = ((h * L + lvl) * P + p) * 2
                gT = g_cat[:, p * Qt : (p + 1) * Qt].reshape(Hl, D, Qt)
                dgxT = g_cat[:, (P + p) * Qt : (P + p + 1) * Qt].reshape(
                    Hl, D, Qt)
                # E[y, q] = sum_d gT * dout  (per-y dot with the cotangent)
                E = jnp.sum(gT * do[None, :, :], axis=1)        # (Hl, Qt)
                Ex = jnp.sum(dgxT * do[None, :, :], axis=1)     # (Hl, Qt)
                da_ref[0, row // 2] = jnp.sum(wyT * E, axis=0)
                dloc_ref[0, row + 1] = (a * jnp.sum(dwyT * E, axis=0)
                                        )[0] * float(Hl)
                dloc_ref[0, row] = jnp.sum(ayT * Ex, axis=0) * float(Wl)
        return 0

    # static unroll over heads: measured 3.62 vs 3.95 ms/layer with a
    # fori_loop at the paper config (Mosaic schedules across iterations)
    for h in range(H):
        head_body(h, 0)


def _bwd_dval_kernel(loc_ref, attn_ref, do_ref, *dv_refs,
                     spatial_shapes, H, D, dtype):
    """Two-kernel adjoint, kernel 1 — d_value per level.

    dvT[(y,d), x] = Σ_{q,p} ay[p, y, q] * dout[d, q] * bxT[x, q]
    computed as an MXU dot with K = P*Qt (point-sum built into the lane
    concat), accumulated over the q-tile grid axis. Unlike the merged
    adjoint this kernel does NOT take vT as an input, so its per-head VMEM
    footprint is one output block + coords — head groups stay large.
    """
    q_idx = pl.program_id(2)
    L = len(spatial_shapes)
    P = loc_ref.shape[1] // (L * H * 2)
    Qt = do_ref.shape[-1]

    for h in range(H):
        do = do_ref[0, h]                                # (D, Qt) f32
        for lvl, (Hl, Wl) in enumerate(spatial_shapes):
            pts = _coord_rows(loc_ref, attn_ref, h, lvl, P, spatial_shapes)
            ops = [_interp_ops(x, y, a, Hl, Wl, Qt) for x, y, a in pts]
            dg_all = jnp.concatenate(
                [(o[1][:, None, :] * do[None, :, :]).reshape(Hl * D, Qt)
                 for o in ops], axis=1)                  # (Hl*D, P*Qt)
            bxT_all = jnp.concatenate([o[0] for o in ops], axis=1)
            acc = _dot(dg_all.astype(dtype), bxT_all.astype(dtype),
                       (((1,), (1,)), ((), ())), dtype)  # (Hl*D, Wl)

            @pl.when(q_idx == 0)
            def _init():
                dv_refs[lvl][0, h] = acc

            @pl.when(q_idx != 0)
            def _accum():
                dv_refs[lvl][0, h] += acc


def _bwd_dloc_kernel(loc_ref, attn_ref, do_ref, *rest,
                     spatial_shapes, H, D, dtype):
    """Two-kernel adjoint, kernel 2 — d_loc (pixel-space) + d_attn.

    Recomputes gT (and the difference-operator variant) in VMEM:
      E[y, q]   = Σ_d gT * dout   (VPU)
      d_attn    = Σ_y wyT * E
      d_ty      = a * Σ_y dwyT * E
      d_tx      = Σ_y ay * (Σ_d dgxT * dout)  with dgxT = vT @ dbxT.
    """
    L = len(spatial_shapes)
    vT_refs = rest[:L]
    dloc_ref, da_ref = rest[L], rest[L + 1]
    P = loc_ref.shape[1] // (L * H * 2)
    Qt = do_ref.shape[-1]

    for h in range(H):
        do = do_ref[0, h]                                # (D, Qt)
        for lvl, (Hl, Wl) in enumerate(spatial_shapes):
            vT = vT_refs[lvl][0, h]                      # (Hl*D, Wl)
            pts = _coord_rows(loc_ref, attn_ref, h, lvl, P, spatial_shapes)
            ops = [_corner_ops(x, y, a, Hl, Wl, Qt) for x, y, a in pts]
            # one dot for all points' gT AND dgxT: lane-concat the bx and
            # difference operators into (Wl, 2*P*Qt).
            bx_cat = jnp.concatenate(
                [o[0] for o in ops] + [o[1] for o in ops], axis=1)
            g_cat = _dot(vT, bx_cat.astype(dtype),
                         (((1,), (0,)), ((), ())), dtype)  # (Hl*D, 2*P*Qt)
            for p in range(P):
                _, _, ayT, wyT, dwyT = ops[p]
                a = pts[p][2]
                row = ((h * L + lvl) * P + p) * 2
                gT = g_cat[:, p * Qt : (p + 1) * Qt].reshape(Hl, D, Qt)
                dgxT = g_cat[:, (P + p) * Qt : (P + p + 1) * Qt].reshape(
                    Hl, D, Qt)
                E = jnp.sum(gT * do[None, :, :], axis=1)        # (Hl, Qt)
                Ex = jnp.sum(dgxT * do[None, :, :], axis=1)     # (Hl, Qt)
                da_ref[0, row // 2] = jnp.sum(wyT * E, axis=0)
                dloc_ref[0, row + 1] = (a * jnp.sum(dwyT * E, axis=0)
                                        )[0] * float(Hl)
                dloc_ref[0, row] = jnp.sum(ayT * Ex, axis=0) * float(Wl)


def _v3_bwd_impl_twokernel(value, sampling_locations, attention_weights,
                           dout, spatial_shapes):
    """Adjoint as two kernels (d_value | d_loc+d_attn).

    A/B vs the merged adjoint on chip (POET_V3_MERGED_ADJOINT selects):
    the merged kernel shares the corner-operator build and g-recompute dot,
    but must keep vT + the d_value block + an f32 scratch resident per head
    group, shrinking Hg (see _pick_head_group call) — two lighter kernels
    can win on occupancy despite the duplicated VPU work.
    """
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape

    vT_levels, locT, attnT, Q_pad = _prep(
        value, spatial_shapes, sampling_locations, attention_weights)

    do = dout.reshape(B, Q, H, D).astype(_F32).transpose(0, 2, 3, 1)
    if Q_pad != Q:
        do = jnp.pad(do, ((0, 0), (0, 0), (0, 0), (0, Q_pad - Q)))

    d_value, dlocT, daT = _bwd_twokernel_core(
        value, vT_levels, locT, attnT, do, spatial_shapes)
    # single relayouts back to the public (B, Q, H, L, P[, 2]) shapes; the
    # loc->pixel chain rule was applied in-kernel
    d_loc = dlocT.transpose(0, 2, 1)[:, :Q].reshape(B, Q, H, L, P, 2)
    d_attn = daT.transpose(0, 2, 1)[:, :Q].reshape(B, Q, H, L, P)
    return (d_value,
            d_loc.astype(sampling_locations.dtype),
            d_attn.astype(attention_weights.dtype))


def _bwd_twokernel_core(value, vT_levels, locT, attnT, do, spatial_shapes):
    """Two-kernel adjoint on staged operands; do is (B, H, D, Q_pad) f32.
    Returns (d_value (B, S, H, D), dlocT, daT) with dlocT/daT in the flat
    (B, F, Q_pad) f32 layout (pixel chain rule folded in-kernel)."""
    B, S, H, D = value.shape
    L = len(spatial_shapes)
    P = attnT.shape[1] // (H * L)
    Q_pad = locT.shape[2]
    dtype = value.dtype
    n_qt = Q_pad // _QT

    # The two kernels keep DIFFERENT value-shaped buffers resident and are
    # budgeted separately (ADVICE r2): d_value holds only its f32 output
    # block (4 bytes/elem regardless of the value dtype — sizing it with a
    # bf16 itemsize oversubscribed scoped VMEM at YOLO-scale geometries);
    # d_loc holds only vT (itemsize).
    def mk_specs(Hg):
        grid = (B, H // Hg, n_qt)
        loc_spec = pl.BlockSpec(
            (1, Hg * L * P * 2, _QT), lambda b, g, q: (b, g, q),
            memory_space=pltpu.VMEM)
        attn_spec = pl.BlockSpec(
            (1, Hg * L * P, _QT), lambda b, g, q: (b, g, q),
            memory_space=pltpu.VMEM)
        do_spec = pl.BlockSpec((1, Hg, D, _QT), lambda b, g, q: (b, g, 0, q),
                               memory_space=pltpu.VMEM)
        v_specs = [
            pl.BlockSpec((1, Hg, Hl * D, Wl), lambda b, g, q: (b, g, 0, 0),
                         memory_space=pltpu.VMEM)
            for Hl, Wl in spatial_shapes
        ]
        return grid, loc_spec, attn_spec, do_spec, v_specs

    Hg_v = _pick_head_group(H, D, spatial_shapes, 4)
    grid, loc_spec, attn_spec, do_spec, _ = mk_specs(Hg_v)
    dv_levels = pl.pallas_call(
        functools.partial(_bwd_dval_kernel, spatial_shapes=spatial_shapes,
                          H=Hg_v, D=D, dtype=dtype),
        grid=grid,
        in_specs=[loc_spec, attn_spec, do_spec],
        out_specs=[
            pl.BlockSpec((1, Hg_v, Hl * D, Wl), lambda b, g, q: (b, g, 0, 0),
                         memory_space=pltpu.VMEM)
            for Hl, Wl in spatial_shapes
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Hl * D, Wl), _F32)
            for Hl, Wl in spatial_shapes
        ],
    )(locT, attnT, do)

    d_value_parts = []
    for (Hl, Wl), dv in zip(spatial_shapes, dv_levels):
        d_value_parts.append(
            dv.reshape(B, H, Hl, D, Wl).transpose(0, 2, 4, 1, 3)
            .reshape(B, Hl * Wl, H, D))
    d_value = jnp.concatenate(d_value_parts, axis=1).astype(dtype)

    Hg_l = _pick_head_group(H, D, spatial_shapes, dtype.itemsize)
    grid, loc_spec, attn_spec, do_spec, v_specs = mk_specs(Hg_l)
    dloc_spec = pl.BlockSpec(
        (1, Hg_l * L * P * 2, _QT), lambda b, g, q: (b, g, q),
        memory_space=pltpu.VMEM)
    dattn_spec = pl.BlockSpec(
        (1, Hg_l * L * P, _QT), lambda b, g, q: (b, g, q),
        memory_space=pltpu.VMEM)
    dlocT, daT = pl.pallas_call(
        functools.partial(_bwd_dloc_kernel, spatial_shapes=spatial_shapes,
                          H=Hg_l, D=D, dtype=dtype),
        grid=grid,
        in_specs=[loc_spec, attn_spec, do_spec, *v_specs],
        out_specs=[dloc_spec, dattn_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, H * L * P * 2, Q_pad), _F32),
            jax.ShapeDtypeStruct((B, H * L * P, Q_pad), _F32),
        ],
    )(locT, attnT, do, *vT_levels)

    return d_value, dlocT, daT


def _v3_bwd_impl(value, sampling_locations, attention_weights, dout,
                 spatial_shapes):
    """Adjoint dispatcher. Default: TWO-KERNEL (on-chip A/B 2026-08-19 at
    the bs=16 paper config: 89.7 ms/step vs 104.2 ms merged — the merged
    kernel's vT + d_value + f32-scratch residency halves its head groups,
    costing more than the shared corner-operator work saves).
    POET_V3_MERGED_ADJOINT=1 selects the merged single-kernel adjoint."""
    if os.environ.get("POET_V3_MERGED_ADJOINT", "0") == "1":
        return _v3_bwd_impl_merged(value, sampling_locations,
                                   attention_weights, dout, spatial_shapes)
    return _v3_bwd_impl_twokernel(value, sampling_locations,
                                  attention_weights, dout, spatial_shapes)


def _v3_bwd_impl_merged(value, sampling_locations, attention_weights, dout,
                        spatial_shapes):
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    dtype = value.dtype

    vT_levels, locT, attnT, Q_pad = _prep(
        value, spatial_shapes, sampling_locations, attention_weights)
    n_qt = Q_pad // _QT
    # vT block + d_value output block (itemsize each) + f32 scratch are all
    # resident per head group — size the group for the sum, not just vT.
    Hg = _pick_head_group(H, D, spatial_shapes, 2 * dtype.itemsize + 4)

    # cotangent -> (B, H, D, Q_pad) f32, the kernel-side layout
    do = dout.reshape(B, Q, H, D).astype(_F32).transpose(0, 2, 3, 1)
    if Q_pad != Q:
        do = jnp.pad(do, ((0, 0), (0, 0), (0, 0), (0, Q_pad - Q)))

    grid = (B, H // Hg, n_qt)
    loc_spec = pl.BlockSpec(
        (1, Hg * L * P * 2, _QT), lambda b, g, q: (b, g, q),
        memory_space=pltpu.VMEM)
    attn_spec = pl.BlockSpec(
        (1, Hg * L * P, _QT), lambda b, g, q: (b, g, q),
        memory_space=pltpu.VMEM)
    do_spec = pl.BlockSpec((1, Hg, D, _QT), lambda b, g, q: (b, g, 0, q),
                           memory_space=pltpu.VMEM)
    v_specs = [
        pl.BlockSpec((1, Hg, Hl * D, Wl), lambda b, g, q: (b, g, 0, 0),
                     memory_space=pltpu.VMEM)
        for Hl, Wl in spatial_shapes
    ]

    # --- fused adjoint: d_value + d_loc + d_attn in one kernel ---
    ymix_bf16 = (dtype == jnp.bfloat16
                 and os.environ.get("POET_V3_YMIX_BF16", "0") == "1")
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, spatial_shapes=spatial_shapes,
                          H=Hg, D=D, dtype=dtype, n_qt=n_qt,
                          ymix_bf16=ymix_bf16),
        grid=grid,
        in_specs=[loc_spec, attn_spec, do_spec, *v_specs],
        out_specs=[
            *[pl.BlockSpec((1, Hg, Hl * D, Wl), lambda b, g, q: (b, g, 0, 0),
                           memory_space=pltpu.VMEM)
              for Hl, Wl in spatial_shapes],
            loc_spec, attn_spec,
        ],
        out_shape=[
            *[jax.ShapeDtypeStruct((B, H, Hl * D, Wl), dtype)
              for Hl, Wl in spatial_shapes],
            jax.ShapeDtypeStruct((B, H * L * P * 2, Q_pad), _F32),
            jax.ShapeDtypeStruct((B, H * L * P, Q_pad), _F32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Hg, Hl * D, Wl), _F32) for Hl, Wl in spatial_shapes
        ],
    )(locT, attnT, do, *vT_levels)
    dv_levels = outs[:L]
    dlocT, daT = outs[L], outs[L + 1]

    # undo the vT layout: (B, H, Hl*D, Wl) -> (B, Hl*Wl, H, D)
    d_value_parts = []
    for (Hl, Wl), dv in zip(spatial_shapes, dv_levels):
        d_value_parts.append(
            dv.reshape(B, H, Hl, D, Wl).transpose(0, 2, 4, 1, 3)
            .reshape(B, Hl * Wl, H, D))
    d_value = jnp.concatenate(d_value_parts, axis=1)

    # single relayouts back to the public (B, Q, H, L, P[, 2]) shapes; the
    # loc->pixel chain rule was applied in-kernel
    d_loc = dlocT.transpose(0, 2, 1)[:, :Q].reshape(B, Q, H, L, P, 2)
    d_attn = daT.transpose(0, 2, 1)[:, :Q].reshape(B, Q, H, L, P)
    return (d_value,
            d_loc.astype(sampling_locations.dtype),
            d_attn.astype(attention_weights.dtype))


# ---------------------------------------------------------------------------
# Mesh partitioning: a pallas_call is opaque to GSPMD/Shardy, so without help
# a sharded caller would all-gather every operand. The op is embarrassingly
# parallel over batch (b), heads (h), and queries (q) — so
# custom_partitioning declares exactly that. The spatial token axis (s) must
# be replicated (every query may sample anywhere). In the backward, d_value
# sums over queries, so under q (sequence-parallel) sharding each shard
# computes a partial d_value and the partition impl psums it over the q mesh
# axes; d_loc/d_attn stay q-sharded.
# ---------------------------------------------------------------------------

from jax.experimental.custom_partitioning import custom_partitioning  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec  # noqa: E402


def _axis_at(shape_like, dim):
    sh = getattr(shape_like, "sharding", None)
    spec = getattr(sh, "spec", None)
    if spec is None or dim >= len(spec):
        return None
    return spec[dim]


@functools.lru_cache(maxsize=None)
def _sharded_fwd(spatial_shapes):
    def _impl(value, loc, attn):
        return ms_deform_attn_pallas_v3(value, spatial_shapes, loc, attn)

    f = custom_partitioning(_impl)

    def _bqh(arg_shapes):
        value_s, loc_s, attn_s = arg_shapes
        b = (_axis_at(value_s, 0) or _axis_at(loc_s, 0) or _axis_at(attn_s, 0))
        h = (_axis_at(value_s, 2) or _axis_at(loc_s, 2) or _axis_at(attn_s, 2))
        q = _axis_at(loc_s, 1) or _axis_at(attn_s, 1)
        return b, q, h

    def infer(mesh, arg_shapes, result_shape):
        b, q, h = _bqh(arg_shapes)
        return NamedSharding(mesh, PartitionSpec(b, q, h))

    def partition(mesh, arg_shapes, result_shape):
        b, q, h = _bqh(arg_shapes)
        arg_sh = (
            NamedSharding(mesh, PartitionSpec(b, None, h, None)),
            NamedSharding(mesh, PartitionSpec(b, q, h, None, None, None)),
            NamedSharding(mesh, PartitionSpec(b, q, h, None, None)),
        )
        out_sh = NamedSharding(mesh, PartitionSpec(b, q, h))
        return mesh, _impl, out_sh, arg_sh

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b s h d, b q h l p two, b q h l p -> b q (h d)",
        need_replication_factors=("s", "l", "p", "two"),
    )
    return f


@functools.lru_cache(maxsize=None)
def _sharded_bwd(spatial_shapes):
    def _impl(value, loc, attn, dout):
        return _v3_bwd_impl(value, loc, attn, dout, spatial_shapes)

    f = custom_partitioning(_impl)

    def _bhq(arg_shapes):
        value_s, loc_s, attn_s, dout_s = arg_shapes
        b = (_axis_at(value_s, 0) or _axis_at(loc_s, 0)
             or _axis_at(dout_s, 0))
        h = _axis_at(value_s, 2) or _axis_at(loc_s, 2)
        q = (_axis_at(loc_s, 1) or _axis_at(attn_s, 1)
             or _axis_at(dout_s, 1))
        return b, h, q

    def infer(mesh, arg_shapes, result_shape):
        b, h, q = _bhq(arg_shapes)
        return (
            NamedSharding(mesh, PartitionSpec(b, None, h, None)),
            NamedSharding(mesh, PartitionSpec(b, q, h, None, None, None)),
            NamedSharding(mesh, PartitionSpec(b, q, h, None, None)),
        )

    def partition(mesh, arg_shapes, result_shape):
        b, h, q = _bhq(arg_shapes)
        # Sequence-parallel (q-sharded) shards each compute d_value for their
        # own queries against the full (replicated) token axis; the true
        # d_value is the sum over query shards — one psum over the q mesh
        # axes, emitted here so the declared (q-replicated) out sharding is
        # already satisfied and the partitioner inserts no extra collective.
        q_axes = (q,) if isinstance(q, str) else tuple(q or ())

        def impl(value, loc, attn, dout):
            d_value, d_loc, d_attn = _v3_bwd_impl(value, loc, attn, dout,
                                                  spatial_shapes)
            if q_axes:
                d_value = jax.lax.psum(d_value, q_axes)
            return d_value, d_loc, d_attn

        arg_sh = (
            NamedSharding(mesh, PartitionSpec(b, None, h, None)),
            NamedSharding(mesh, PartitionSpec(b, q, h, None, None, None)),
            NamedSharding(mesh, PartitionSpec(b, q, h, None, None)),
            NamedSharding(mesh, PartitionSpec(b, q, h)),
        )
        out_sh = (
            NamedSharding(mesh, PartitionSpec(b, None, h, None)),
            NamedSharding(mesh, PartitionSpec(b, q, h, None, None, None)),
            NamedSharding(mesh, PartitionSpec(b, q, h, None, None)),
        )
        return mesh, impl, out_sh, arg_sh

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        # NB: special factors must be listed in first-appearance order
        # (Shardy verifier: "indices of special factors must be sorted").
        # `q` is a passthrough factor (d_loc/d_attn keep the query sharding);
        # d_value has no q dimension and the partition impl supplies the
        # cross-shard reduction itself.
        sharding_rule=("b s h d, b q h l p two, b q h l p, b q (h d) "
                       "-> b s h d, b q h l p two, b q h l p"),
        need_replication_factors=("s", "l", "p", "two"),
    )
    return f


def _in_mesh_context() -> bool:
    mesh = jax.sharding.get_abstract_mesh()
    return bool(getattr(mesh, "axis_names", ()))


def _v3_fwd(value, spatial_shapes, sampling_locations, attention_weights):
    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    if _in_mesh_context():
        out = _sharded_fwd(shapes)(value, sampling_locations,
                                   attention_weights)
    else:
        out = ms_deform_attn_pallas_v3(value, shapes, sampling_locations,
                                       attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _v3_bwd(spatial_shapes, res, dout):
    value, sampling_locations, attention_weights = res
    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    if _in_mesh_context():
        return _sharded_bwd(shapes)(value, sampling_locations,
                                    attention_weights, dout)
    return _v3_bwd_impl(value, sampling_locations, attention_weights, dout,
                        shapes)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_fused(value, spatial_shapes, sampling_locations,
                         attention_weights):
    """`ms_deform_attn_pallas_v3` with the fused Pallas backward.

    Under an active mesh (`jax.set_mesh`) both passes carry
    custom_partitioning rules: batch, head, and query (sequence-parallel)
    axes shard cleanly (the backward psums the query-partial d_value); only
    the token axis `s` is declared need-replication.
    """
    return ms_deform_attn_pallas_v3(
        value, spatial_shapes, sampling_locations, attention_weights)


ms_deform_attn_fused.defvjp(_v3_fwd, _v3_bwd)


# ---------------------------------------------------------------------------
# Transposed-native entry: the caller supplies locT/attnT ALREADY in the
# kernel's flat (B, F, Q_pad) layout (models/transformer.py builds them by
# emitting the offsets/attention projections pre-transposed — the dot picks
# the output layout, so the ~1.3 ms/layer locT/attnT staging transposes the
# legacy entry pays at YOLO scale disappear, in the forward AND in the
# backward, whose residuals are now the staged tensors themselves).
# Mesh-capable (r5): under an active mesh both passes go through
# custom_partitioning twins of the legacy rules — the flat coordinate rows
# are h-MAJOR, so a head shard is a plain block row-slice of locT/attnT
# (factor product "(h f)" in the Shardy rule), batch and the q lane axis
# shard natively, and the backward psums the query-partial d_value over the
# q mesh axes. Per-shard Q_pad must stay a multiple of the query tile: the
# model pads the token axis to _QT * n_seq (models/transformer.py).
# ---------------------------------------------------------------------------


def _v3_t_impl(value, spatial_shapes, locT, attnT):
    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    B, S, H, D = value.shape
    Q_pad = locT.shape[2]
    assert Q_pad % _QT == 0, (Q_pad, _QT)
    vT_levels = _prep_value(value, shapes)
    out = _fwd_core(vT_levels, locT, attnT, shapes, value.dtype)
    out = out.transpose(0, 3, 1, 2)                       # (B, Q_pad, H, D)
    return out.reshape(B, Q_pad, H * D).astype(value.dtype)


def _v3_t_bwd_impl(value, locT, attnT, dout, spatial_shapes):
    """T-entry adjoint on staged operands (shared by the single-device path
    and the per-shard partition impl)."""
    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    B, S, H, D = value.shape
    Q_pad = locT.shape[2]
    vT_levels = _prep_value(value, shapes)
    do = dout.reshape(B, Q_pad, H, D).astype(_F32).transpose(0, 2, 3, 1)
    d_value, dlocT, daT = _bwd_twokernel_core(
        value, vT_levels, locT, attnT, do, shapes)
    # trailing pad tokens (token axis pre-padded to the query tile) never
    # enter any level, so their gradient is exactly zero
    S_lv = sum(h * w for h, w in shapes)
    if S_lv < S:
        d_value = jnp.pad(d_value, ((0, 0), (0, S - S_lv), (0, 0), (0, 0)))
    return d_value, dlocT, daT


@functools.lru_cache(maxsize=None)
def _sharded_fwd_t(spatial_shapes, n_points):
    def _impl(value, locT, attnT):
        return _v3_t_impl(value, spatial_shapes, locT, attnT)

    f = custom_partitioning(_impl)

    def _bqh(arg_shapes):
        value_s, loc_s, attn_s = arg_shapes
        b = (_axis_at(value_s, 0) or _axis_at(loc_s, 0) or _axis_at(attn_s, 0))
        h = (_axis_at(value_s, 2) or _axis_at(loc_s, 1) or _axis_at(attn_s, 1))
        q = _axis_at(loc_s, 2) or _axis_at(attn_s, 2)
        return b, q, h

    def infer(mesh, arg_shapes, result_shape):
        b, q, h = _bqh(arg_shapes)
        return NamedSharding(mesh, PartitionSpec(b, q, h))

    def partition(mesh, arg_shapes, result_shape):
        b, q, h = _bqh(arg_shapes)
        arg_sh = (
            NamedSharding(mesh, PartitionSpec(b, None, h, None)),
            NamedSharding(mesh, PartitionSpec(b, h, q)),
            NamedSharding(mesh, PartitionSpec(b, h, q)),
        )
        out_sh = NamedSharding(mesh, PartitionSpec(b, q, h))
        return mesh, _impl, out_sh, arg_sh

    L = len(spatial_shapes)
    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        # h-major coordinate rows: a head shard of locT/attnT is a block
        # row-slice — expressed as the factor products (h f2) / (h f1);
        # compound-only factors need explicit sizes (Shardy verifier)
        sharding_rule="b s h d, b (h f2) q, b (h f1) q -> b q (h d)",
        need_replication_factors=("s", "f2", "f1"),
        f2=L * n_points * 2, f1=L * n_points,
    )
    return f


@functools.lru_cache(maxsize=None)
def _sharded_bwd_t(spatial_shapes, n_points):
    def _raw(value, locT, attnT, dout):
        return _v3_t_bwd_impl(value, locT, attnT, dout, spatial_shapes)

    f = custom_partitioning(_raw)

    def _bhq(arg_shapes):
        value_s, loc_s, attn_s, dout_s = arg_shapes
        b = (_axis_at(value_s, 0) or _axis_at(loc_s, 0)
             or _axis_at(dout_s, 0))
        h = (_axis_at(value_s, 2) or _axis_at(loc_s, 1)
             or _axis_at(attn_s, 1) or _axis_at(dout_s, 2))
        q = (_axis_at(loc_s, 2) or _axis_at(attn_s, 2)
             or _axis_at(dout_s, 1))
        return b, h, q

    def infer(mesh, arg_shapes, result_shape):
        b, h, q = _bhq(arg_shapes)
        return (
            NamedSharding(mesh, PartitionSpec(b, None, h, None)),
            NamedSharding(mesh, PartitionSpec(b, h, q)),
            NamedSharding(mesh, PartitionSpec(b, h, q)),
        )

    def partition(mesh, arg_shapes, result_shape):
        b, h, q = _bhq(arg_shapes)
        # q-sharded (sequence-parallel) shards compute d_value for their own
        # queries against the replicated token axis; one psum over the q
        # mesh axes completes it (same contract as the legacy bwd rule).
        q_axes = (q,) if isinstance(q, str) else tuple(q or ())

        def impl(value, locT, attnT, dout):
            d_value, dlocT, daT = _v3_t_bwd_impl(value, locT, attnT, dout,
                                                 spatial_shapes)
            if q_axes:
                d_value = jax.lax.psum(d_value, q_axes)
            return d_value, dlocT, daT

        arg_sh = (
            NamedSharding(mesh, PartitionSpec(b, None, h, None)),
            NamedSharding(mesh, PartitionSpec(b, h, q)),
            NamedSharding(mesh, PartitionSpec(b, h, q)),
            NamedSharding(mesh, PartitionSpec(b, q, h)),
        )
        out_sh = (
            NamedSharding(mesh, PartitionSpec(b, None, h, None)),
            NamedSharding(mesh, PartitionSpec(b, h, q)),
            NamedSharding(mesh, PartitionSpec(b, h, q)),
        )
        return mesh, impl, out_sh, arg_sh

    L = len(spatial_shapes)
    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=("b s h d, b (h f2) q, b (h f1) q, b q (h d) "
                       "-> b s h d, b (h f2) q, b (h f1) q"),
        need_replication_factors=("s", "f2", "f1"),
        f2=L * n_points * 2, f1=L * n_points,
    )
    return f


def _t_n_points(value, attnT, spatial_shapes):
    return attnT.shape[1] // (value.shape[2] * len(spatial_shapes))


def _v3_t_fwd(value, spatial_shapes, locT, attnT):
    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    if _in_mesh_context():
        P = _t_n_points(value, attnT, shapes)
        out = _sharded_fwd_t(shapes, P)(value, locT, attnT)
    else:
        out = _v3_t_impl(value, shapes, locT, attnT)
    return out, (value, locT, attnT)


def _v3_t_bwd(spatial_shapes, res, dout):
    value, locT, attnT = res
    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    if _in_mesh_context():
        P = _t_n_points(value, attnT, shapes)
        return _sharded_bwd_t(shapes, P)(value, locT, attnT, dout)
    return _v3_t_bwd_impl(value, locT, attnT, dout, shapes)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_fused_t(value, spatial_shapes, locT, attnT):
    """Fused deformable sampling on pre-transposed coordinate operands.

    value (B, S, H, D); locT (B, H*L*P*2, Q_pad) f32 raw NORMALIZED
    locations, row order (h, l, p, coord), Q_pad a multiple of the kernel's
    query tile; attnT (B, H*L*P, Q_pad) f32 softmaxed attention.
    Returns (B, Q_pad, H*D) in value.dtype — rows beyond the caller's true
    Q are garbage (they sample wherever the padded coords point) and must
    be sliced off. Backward returns (d_value, d_locT, d_attnT) in the same
    flat layouts.

    Mesh-capable: under an active mesh both passes run through
    custom_partitioning rules mirroring `ms_deform_attn_fused` — batch,
    head (a block row-slice of the h-major flat rows), and query axes
    shard without gathers; the backward psums the query-partial d_value
    over the q mesh axes. Under 'seq' sharding the caller must keep each
    shard's q slice a multiple of the query tile
    (models/transformer.py:_q_tile_unit pads the token axis accordingly).
    """
    return _v3_t_impl(value, spatial_shapes, locT, attnT)


ms_deform_attn_fused_t.defvjp(_v3_t_fwd, _v3_t_bwd)


# ---------------------------------------------------------------------------
# T2 entry: transposed-native on BOTH sides. Same staged operands as the T
# entry, but the result stays in the kernel's own (B, H*D, Q_pad) layout —
# value.dtype, cast in-kernel from the f32 accumulator. The caller applies
# the output projection as a dot_general that contracts the leading H*D
# axis, so the (B,H,D,Q)->(B,Q,H*D) relayout pass the T entry pays per
# layer (a full ~0.6 ms HBM round-trip at YOLO scale, forward AND backward
# — the adjoint un-transposed dout before the kernels) becomes a free
# by-product of the projection matmul. models/transformer.py is the
# intended caller.
# ---------------------------------------------------------------------------


def _v3_t2_impl(value, spatial_shapes, locT, attnT):
    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    B, S, H, D = value.shape
    Q_pad = locT.shape[2]
    assert Q_pad % _QT == 0, (Q_pad, _QT)
    vT_levels = _prep_value(value, shapes)
    out = _fwd_core(vT_levels, locT, attnT, shapes, value.dtype,
                    out_dtype=value.dtype)               # (B, H, D, Q_pad)
    return out.reshape(B, H * D, Q_pad)                  # free: dims adjacent


def _v3_t2_bwd_impl(value, locT, attnT, dout, spatial_shapes):
    """T2 adjoint: dout arrives already in the kernel-native (B, H*D, Q_pad)
    layout, so — unlike the T entry — no transpose pass precedes the
    backward kernels, only a dtype convert."""
    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    B, S, H, D = value.shape
    Q_pad = locT.shape[2]
    vT_levels = _prep_value(value, shapes)
    do = dout.reshape(B, H, D, Q_pad).astype(_F32)
    d_value, dlocT, daT = _bwd_twokernel_core(
        value, vT_levels, locT, attnT, do, shapes)
    S_lv = sum(h * w for h, w in shapes)
    if S_lv < S:
        d_value = jnp.pad(d_value, ((0, 0), (0, S - S_lv), (0, 0), (0, 0)))
    return d_value, dlocT, daT


@functools.lru_cache(maxsize=None)
def _sharded_fwd_t2(spatial_shapes, n_points):
    def _impl(value, locT, attnT):
        return _v3_t2_impl(value, spatial_shapes, locT, attnT)

    f = custom_partitioning(_impl)

    def _bqh(arg_shapes):
        value_s, loc_s, attn_s = arg_shapes
        b = (_axis_at(value_s, 0) or _axis_at(loc_s, 0) or _axis_at(attn_s, 0))
        h = (_axis_at(value_s, 2) or _axis_at(loc_s, 1) or _axis_at(attn_s, 1))
        q = _axis_at(loc_s, 2) or _axis_at(attn_s, 2)
        return b, q, h

    def infer(mesh, arg_shapes, result_shape):
        b, q, h = _bqh(arg_shapes)
        return NamedSharding(mesh, PartitionSpec(b, h, q))

    def partition(mesh, arg_shapes, result_shape):
        b, q, h = _bqh(arg_shapes)
        arg_sh = (
            NamedSharding(mesh, PartitionSpec(b, None, h, None)),
            NamedSharding(mesh, PartitionSpec(b, h, q)),
            NamedSharding(mesh, PartitionSpec(b, h, q)),
        )
        out_sh = NamedSharding(mesh, PartitionSpec(b, h, q))
        return mesh, _impl, out_sh, arg_sh

    L = len(spatial_shapes)
    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        # output rows are (h d)-major: a head shard is a block row-slice of
        # the output exactly as it is of locT/attnT
        sharding_rule="b s h d, b (h f2) q, b (h f1) q -> b (h d) q",
        need_replication_factors=("s", "d", "f2", "f1"),
        f2=L * n_points * 2, f1=L * n_points,
    )
    return f


@functools.lru_cache(maxsize=None)
def _sharded_bwd_t2(spatial_shapes, n_points):
    def _raw(value, locT, attnT, dout):
        return _v3_t2_bwd_impl(value, locT, attnT, dout, spatial_shapes)

    f = custom_partitioning(_raw)

    def _bhq(arg_shapes):
        value_s, loc_s, attn_s, dout_s = arg_shapes
        b = (_axis_at(value_s, 0) or _axis_at(loc_s, 0)
             or _axis_at(dout_s, 0))
        h = (_axis_at(value_s, 2) or _axis_at(loc_s, 1)
             or _axis_at(attn_s, 1) or _axis_at(dout_s, 1))
        q = (_axis_at(loc_s, 2) or _axis_at(attn_s, 2)
             or _axis_at(dout_s, 2))
        return b, h, q

    def infer(mesh, arg_shapes, result_shape):
        b, h, q = _bhq(arg_shapes)
        return (
            NamedSharding(mesh, PartitionSpec(b, None, h, None)),
            NamedSharding(mesh, PartitionSpec(b, h, q)),
            NamedSharding(mesh, PartitionSpec(b, h, q)),
        )

    def partition(mesh, arg_shapes, result_shape):
        b, h, q = _bhq(arg_shapes)
        q_axes = (q,) if isinstance(q, str) else tuple(q or ())

        def impl(value, locT, attnT, dout):
            d_value, dlocT, daT = _v3_t2_bwd_impl(value, locT, attnT, dout,
                                                  spatial_shapes)
            if q_axes:
                d_value = jax.lax.psum(d_value, q_axes)
            return d_value, dlocT, daT

        arg_sh = (
            NamedSharding(mesh, PartitionSpec(b, None, h, None)),
            NamedSharding(mesh, PartitionSpec(b, h, q)),
            NamedSharding(mesh, PartitionSpec(b, h, q)),
            NamedSharding(mesh, PartitionSpec(b, h, q)),
        )
        out_sh = (
            NamedSharding(mesh, PartitionSpec(b, None, h, None)),
            NamedSharding(mesh, PartitionSpec(b, h, q)),
            NamedSharding(mesh, PartitionSpec(b, h, q)),
        )
        return mesh, impl, out_sh, arg_sh

    L = len(spatial_shapes)
    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=("b s h d, b (h f2) q, b (h f1) q, b (h d) q "
                       "-> b s h d, b (h f2) q, b (h f1) q"),
        need_replication_factors=("s", "d", "f2", "f1"),
        f2=L * n_points * 2, f1=L * n_points,
    )
    return f


def _v3_t2_fwd(value, spatial_shapes, locT, attnT):
    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    if _in_mesh_context():
        P = _t_n_points(value, attnT, shapes)
        out = _sharded_fwd_t2(shapes, P)(value, locT, attnT)
    else:
        out = _v3_t2_impl(value, shapes, locT, attnT)
    return out, (value, locT, attnT)


def _v3_t2_bwd(spatial_shapes, res, dout):
    value, locT, attnT = res
    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    if _in_mesh_context():
        P = _t_n_points(value, attnT, shapes)
        return _sharded_bwd_t2(shapes, P)(value, locT, attnT, dout)
    return _v3_t2_bwd_impl(value, locT, attnT, dout, shapes)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_fused_t2(value, spatial_shapes, locT, attnT):
    """`ms_deform_attn_fused_t` with a kernel-native RESULT layout.

    Same operands; returns (B, H*D, Q_pad) in value.dtype (rows h-major, so
    row block h*D..(h+1)*D is head h — a head shard is a block row-slice).
    The caller applies the output projection by contracting axis 1, which
    absorbs the (B,H,D,Q)->(B,Q,H*D) relayout the T entry pays as a
    separate full-tensor pass per layer — in the forward AND the backward
    (the T adjoint must un-transpose dout; here dout arrives
    kernel-native). Mesh rules mirror the T entry with the output's q/h
    axes swapped."""
    return _v3_t2_impl(value, spatial_shapes, locT, attnT)


ms_deform_attn_fused_t2.defvjp(_v3_t2_fwd, _v3_t2_bwd)
