"""Fused Pallas TPU kernel for multi-scale deformable attention.

This is the TPU-native replacement for the Deformable-DETR CUDA op (N1 in
SURVEY §2.2) — the hot kernel of the whole model. Numerics match
`poet_tpu.ops.deform_attn.ms_deform_attn_xla` (== torch grid_sample bilinear,
zero padding, align_corners=False); tested against it.

Why a kernel: TPU has no fast random gather. The pure-XLA one-hot-matmul
formulation (ms_deform_attn_mxu) is correct but materializes its (Q x S_l)
sampling matrices in HBM — measured 22 ms/encoder-layer at PoET scale. Here
the sampling-matrix TILES live only in VMEM and feed the MXU directly.

Design:
  * grid (B, H, Q_tiles), query-tile innermost; per (batch, head) the kernel
    holds the full value slab (S x D, ~100 KB) in VMEM,
  * ZERO-PADDED value buffer: each level is copied once (on the first query
    tile) into scratch with a 1-pixel zero border. Sampling indices shift by
    (+1, +1) into padded space, so every bilinear corner of an in-range
    sample lands either on a real texel or on a zero — grid_sample's
    zero-padding semantics with NO masks, NO clips, NO corner-validity
    logic. Samples further outside match no one-hot row and contribute
    zero, also matching grid_sample.
  * per (point, corner): one iota==index compare builds a one-hot row tile
    (Qt x S_pad_l) on the VPU; fused multiply-add folds bilinear x attention
    weights; per level one (Qt x S_pad_l) @ (S_pad_l x D) matmul on the MXU,
  * custom VJP with the same structure: d_value is the TRANSPOSED matmul
    (the "scatter" becomes a matmul, accumulated across query tiles in
    scratch), d_attention / d_locations come from per-corner dot products
    u[q, s] = g[q] . v_pad[s] reduced through the same one-hots.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


def _max_spl(layout):
    return max((Hl + 2) * (Wl + 2) for _, _, Hl, Wl in layout)


def _padded_layout(spatial_shapes):
    """Per-level (offset_in, offset_pad, Hl, Wl) + input/padded totals."""
    layout = []
    off_in, off_pad = 0, 0
    for Hl, Wl in spatial_shapes:
        layout.append((off_in, off_pad, Hl, Wl))
        off_in += Hl * Wl
        off_pad += (Hl + 2) * (Wl + 2)
    return layout, off_in, off_pad


def _fill_padded(val, vpad_ref, layout):
    """Copy each level of the (S, D) value slab into the zero-bordered scratch."""
    vpad_ref[:] = jnp.zeros_like(vpad_ref)
    for off_in, off_pad, Hl, Wl in layout:
        Wp = Wl + 2
        # one copy per row keeps everything statically shaped
        for y in range(Hl):
            vpad_ref[pl.ds(off_pad + (y + 1) * Wp + 1, Wl), :] = val[
                off_in + y * Wl : off_in + y * Wl + Wl, :
            ]


def _corner_terms(loc_l, attn_l, Hl, Wl):
    """Corner indices in PADDED level space + combined weights.

    loc_l: (Qt, P, 2); attn_l: (Qt, P). Corners ordered (y0x0, y0x1, y1x0,
    y1x1). Bases outside the padded buffer map far negative (match nothing).
    """
    Wp = Wl + 2
    x = loc_l[..., 0].astype(_F32) * Wl - 0.5        # (Qt, P)
    y = loc_l[..., 1].astype(_F32) * Hl - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    in_buf = (x0i >= -1) & (x0i <= Wl) & (y0i >= -1) & (y0i <= Hl)
    base = (y0i + 1) * Wp + (x0i + 1)
    base = jnp.where(in_buf, base, -(2 ** 30))
    a = attn_l.astype(_F32)
    wgt = (
        a * (1 - tx) * (1 - ty),
        a * tx * (1 - ty),
        a * (1 - tx) * ty,
        a * tx * ty,
    )
    idx = (base, base + 1, base + Wp, base + Wp + 1)
    return idx, wgt, (tx, ty, a)


def _slot_arrays(idx, wgt, P):
    """Stack per-(point, corner) indices/weights: (4P, Qt) each."""
    idx_all = jnp.stack([idx[c][:, p] for p in range(P) for c in range(4)])
    wgt_all = jnp.stack([wgt[c][:, p] for p in range(P) for c in range(4)])
    return idx_all, wgt_all


def _accumulate_wmat(wmat_ref, slot_idx_ref, slot_wgt_ref, idx, wgt, Qt, SPl, P):
    """Dense (Qt, SPl) sampling-matrix tile from 4*P one-hot FMA passes.

    Accumulates IN-PLACE into a scratch ref inside a fori_loop: unrolled SSA
    accumulation makes Mosaic keep every one-hot temporary live at once
    (observed 60 MB scoped-VMEM OOM); a real loop + read-modify-write keeps
    the working set at one (Qt, SPl) tile + one temporary. Slot indices and
    weights are staged through scratch refs because Mosaic cannot
    dynamic-slice SSA values, only refs.
    """
    iota = lax.broadcasted_iota(jnp.int32, (Qt, SPl), 1)
    # per-row writes: stacking strided slices trips a Mosaic concat bug
    k = 0
    for pp in range(P):
        for c in range(4):
            slot_idx_ref[k, :] = idx[c][:, pp]
            slot_wgt_ref[k, :] = wgt[c][:, pp]
            k += 1

    wmat_ref[:, :SPl] = jnp.zeros((Qt, SPl), _F32)

    def body(i, _):
        row_idx = slot_idx_ref[i, :]
        row_wgt = slot_wgt_ref[i, :]
        wmat_ref[:, :SPl] += jnp.where(
            iota == row_idx[:, None], row_wgt[:, None], 0.0
        )
        return 0

    lax.fori_loop(0, 4 * P, body, 0)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(loc_ref, attn_ref, value_ref, out_ref, vpad_ref, wmat_ref,
                slot_idx_ref, slot_wgt_ref, *, layout, P, Qt):
    qt = pl.program_id(2)

    @pl.when(qt == 0)
    def _():
        _fill_padded(value_ref[0, 0], vpad_ref, layout)

    loc = loc_ref[0, 0]                            # (Qt, L, P, 2)
    attn = attn_ref[0, 0]                          # (Qt, L, P)

    acc = jnp.zeros((Qt, value_ref.shape[-1]), _F32)
    for lvl, (off_in, off_pad, Hl, Wl) in enumerate(layout):
        SPl = (Hl + 2) * (Wl + 2)
        idx, wgt, _ = _corner_terms(loc[:, lvl], attn[:, lvl], Hl, Wl)
        _accumulate_wmat(wmat_ref, slot_idx_ref, slot_wgt_ref, idx, wgt, Qt, SPl, P)
        v_l = vpad_ref[pl.ds(off_pad, SPl), :]
        acc = acc + jnp.dot(wmat_ref[:, :SPl], v_l, preferred_element_type=_F32)
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def _pick_q_tile(Q, q_tile):
    # Qt is capped at 128: Mosaic fully unrolls vector ops over register
    # tiles, so a (512, S_pad) working tile explodes compile time (>35 min
    # observed); (128, S_pad) compiles in ~1.5 min with the same total work.
    rounded = ((Q + 127) // 128) * 128
    return min(q_tile, rounded, 128)


def _pad_q(locs, attn, Qt):
    Q = locs.shape[1]
    Q_pad = ((Q + Qt - 1) // Qt) * Qt
    if Q_pad != Q:
        pad = Q_pad - Q
        locs = jnp.pad(locs, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0), (0, 0)),
                       constant_values=-10.0)      # far outside -> contributes 0
        attn = jnp.pad(attn, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
    return locs, attn, Q_pad


def _run_forward(value, spatial_shapes, locs, attn, q_tile):
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = locs.shape
    layout, S_in, S_pad = _padded_layout(spatial_shapes)
    assert S_in == S

    Qt = _pick_q_tile(Q, q_tile)
    locs, attn, Q_pad = _pad_q(locs, attn, Qt)
    nQt = Q_pad // Qt

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, layout=layout, P=P, Qt=Qt),
        grid=(B, H, nQt),
        in_specs=[
            pl.BlockSpec((1, 1, Qt, L, P, 2), lambda b, h, q: (b, h, q, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Qt, L, P), lambda b, h, q: (b, h, q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, D), lambda b, h, q: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Qt, D), lambda b, h, q: (b, h, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Q_pad, D), value.dtype),
        scratch_shapes=[
            pltpu.VMEM((S_pad, D), _F32),
            pltpu.VMEM((Qt, _max_spl(layout)), _F32),
            pltpu.VMEM((4 * P, Qt), jnp.int32),
            pltpu.VMEM((4 * P, Qt), _F32),
        ],
    )(
        locs.transpose(0, 2, 1, 3, 4, 5),
        attn.transpose(0, 2, 1, 3, 4),
        value.transpose(0, 2, 1, 3),
    )
    return out.transpose(0, 2, 1, 3)[:, :Q]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(loc_ref, attn_ref, value_ref, g_ref,
                dval_ref, dloc_ref, dattn_ref,
                vpad_ref, dvpad_ref, wmat_ref, slot_idx_ref, slot_wgt_ref,
                dots_ref, *, layout, P, Qt, n_qt):
    qt = pl.program_id(2)

    @pl.when(qt == 0)
    def _():
        _fill_padded(value_ref[0, 0], vpad_ref, layout)
        dvpad_ref[:] = jnp.zeros_like(dvpad_ref)

    loc = loc_ref[0, 0]
    attn = attn_ref[0, 0]
    g = g_ref[0, 0].astype(_F32)                 # (Qt, D)

    for lvl, (off_in, off_pad, Hl, Wl) in enumerate(layout):
        SPl = (Hl + 2) * (Wl + 2)
        idx, wgt, (tx, ty, a) = _corner_terms(loc[:, lvl], attn[:, lvl], Hl, Wl)

        # d_value: Wmatᵀ @ g accumulated into padded scratch
        _accumulate_wmat(wmat_ref, slot_idx_ref, slot_wgt_ref, idx, wgt, Qt, SPl, P)
        dv = jax.lax.dot_general(
            wmat_ref[:, :SPl], g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=_F32,
        )                                              # (SPl, D)
        dvpad_ref[pl.ds(off_pad, SPl), :] += dv

        # u[q, s] = g[q] . v_pad[s]  — (Qt, SPl) without transposes
        v_l = vpad_ref[pl.ds(off_pad, SPl), :]
        u = jax.lax.dot_general(
            g, v_l, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=_F32,
        )                                              # (Qt, SPl)

        iota = lax.broadcasted_iota(jnp.int32, (Qt, SPl), 1)

        def dot_body(i, _):
            row_idx = slot_idx_ref[i, :]
            sel = jnp.where(iota == row_idx[:, None], u, 0.0)
            dots_ref[i, :] = jnp.sum(sel, axis=1)
            return 0

        lax.fori_loop(0, 4 * P, dot_body, 0)           # slot = p*4 + c
        dots_all = dots_ref[:]
        d00 = jnp.stack([dots_all[p * 4 + 0] for p in range(P)], axis=1)
        d01 = jnp.stack([dots_all[p * 4 + 1] for p in range(P)], axis=1)
        d10 = jnp.stack([dots_all[p * 4 + 2] for p in range(P)], axis=1)
        d11 = jnp.stack([dots_all[p * 4 + 3] for p in range(P)], axis=1)

        b00 = (1 - tx) * (1 - ty)
        b01 = tx * (1 - ty)
        b10 = (1 - tx) * ty
        b11 = tx * ty
        dattn = b00 * d00 + b01 * d01 + b10 * d10 + b11 * d11
        dattn_ref[0, 0, :, lvl] = dattn.astype(dattn_ref.dtype)

        dx = a * ((1 - ty) * (d01 - d00) + ty * (d11 - d10)) * Wl
        dy = a * ((1 - tx) * (d10 - d00) + tx * (d11 - d01)) * Hl
        dloc_ref[0, 0, :, lvl, :, 0] = dx.astype(dloc_ref.dtype)
        dloc_ref[0, 0, :, lvl, :, 1] = dy.astype(dloc_ref.dtype)

    @pl.when(qt == n_qt - 1)
    def _():
        for off_in, off_pad, Hl, Wl in layout:
            Wp = Wl + 2
            for y in range(Hl):
                dval_ref[0, 0, pl.ds(off_in + y * Wl, Wl), :] = dvpad_ref[
                    pl.ds(off_pad + (y + 1) * Wp + 1, Wl), :
                ].astype(dval_ref.dtype)


def _run_backward(value, spatial_shapes, locs, attn, g, q_tile):
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = locs.shape
    layout, _, S_pad = _padded_layout(spatial_shapes)

    Qt = _pick_q_tile(Q, q_tile)
    locs, attn, Q_pad = _pad_q(locs, attn, Qt)
    if Q_pad != Q:
        g = jnp.pad(g, ((0, 0), (0, Q_pad - Q), (0, 0), (0, 0)))
    nQt = Q_pad // Qt

    dval, dloc, dattn = pl.pallas_call(
        functools.partial(_bwd_kernel, layout=layout, P=P, Qt=Qt, n_qt=nQt),
        grid=(B, H, nQt),
        in_specs=[
            pl.BlockSpec((1, 1, Qt, L, P, 2), lambda b, h, q: (b, h, q, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Qt, L, P), lambda b, h, q: (b, h, q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, D), lambda b, h, q: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Qt, D), lambda b, h, q: (b, h, q, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, S, D), lambda b, h, q: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Qt, L, P, 2), lambda b, h, q: (b, h, q, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Qt, L, P), lambda b, h, q: (b, h, q, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, S, D), value.dtype),
            jax.ShapeDtypeStruct((B, H, Q_pad, L, P, 2), locs.dtype),
            jax.ShapeDtypeStruct((B, H, Q_pad, L, P), attn.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((S_pad, D), _F32),
            pltpu.VMEM((S_pad, D), _F32),
            pltpu.VMEM((Qt, _max_spl(layout)), _F32),
            pltpu.VMEM((4 * P, Qt), jnp.int32),
            pltpu.VMEM((4 * P, Qt), _F32),
            pltpu.VMEM((4 * P, Qt), _F32),
        ],
    )(
        locs.transpose(0, 2, 1, 3, 4, 5),
        attn.transpose(0, 2, 1, 3, 4),
        value.transpose(0, 2, 1, 3),
        g.transpose(0, 2, 1, 3),
    )
    return (
        dval.transpose(0, 2, 1, 3),
        dloc.transpose(0, 2, 1, 3, 4, 5)[:, :Q],
        dattn.transpose(0, 2, 1, 3, 4)[:, :Q],
    )


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def ms_deform_attn_pallas(value, spatial_shapes, sampling_locations,
                          attention_weights, q_tile: int = 512):
    """Fused deformable-attention sampling on TPU.

    Same contract as ms_deform_attn_xla: value (B, S, H, D), static
    spatial_shapes, locations (B, Q, H, L, P, 2) in [0, 1], weights
    (B, Q, H, L, P) -> (B, Q, H*D).
    """
    out = _run_forward(value, tuple(spatial_shapes), sampling_locations,
                       attention_weights, q_tile)
    B, Q, H, D = out.shape
    return out.reshape(B, Q, H * D)


def _vjp_fwd(value, spatial_shapes, locs, attn, q_tile):
    out = ms_deform_attn_pallas(value, spatial_shapes, locs, attn, q_tile)
    return out, (value, locs, attn)


def _vjp_bwd(spatial_shapes, q_tile, residuals, g):
    value, locs, attn = residuals
    B, S, H, D = value.shape
    Q = locs.shape[1]
    g4 = g.reshape(B, Q, H, D)
    dval, dloc, dattn = _run_backward(value, tuple(spatial_shapes), locs, attn,
                                      g4, q_tile)
    return dval, dloc, dattn


ms_deform_attn_pallas.defvjp(_vjp_fwd, _vjp_bwd)
