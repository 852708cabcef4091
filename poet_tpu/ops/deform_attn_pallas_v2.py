"""Separable Pallas kernel for multi-scale deformable attention (v2).

Same contract and numerics as `ms_deform_attn_pallas` (v1) and the XLA
reference — but restructured so almost all work rides the MXU:

v1 builds a dense (Qt x S_pad_l) sampling matrix with 4P one-hot FMA passes
per level — O(Q · 16 · S_l) VPU element-ops, which measures VPU-bound at
PoET encoder scale. v2 exploits the SEPARABILITY of bilinear sampling:

    sample_p(q) = Σ_y wy_p[q, y] · Σ_x wx_p[q, x] · V[y, x, :]

Per (level, point):
  1. Wy (Qt x Hp): TWO one-hot passes over the (tiny) row axis, attention
     weight folded in,
  2. T = Wy @ Vpad, with Vpad stored as (Hp, Wp·D) — an MXU matmul that
     performs the y-interpolation for all queries at once,
  3. x-interpolation: a (Qt x Wp·D) masked-weight multiply (two passes over
     the column axis) followed by a matmul against a constant block-identity
     reduction matrix R[(x, d), d'] = 1[d == d'] — MXU again.

Zero-padding semantics come from the same 1-texel zero border as v1 (indices
shift by +1; out-of-range bases match no one-hot row).

Forward only for now: v1 provides the custom VJP; the module uses
impl='pallas_v2' for inference paths.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


def _layout(spatial_shapes):
    """(off_in, row_off_pad, Hl, Wl) per level; scratch rows are stacked
    (Hp_0 + Hp_1 + ...) with a shared padded width max(Wp_l)·D columns."""
    rows = []
    off_in, row_off = 0, 0
    for Hl, Wl in spatial_shapes:
        rows.append((off_in, row_off, Hl, Wl))
        off_in += Hl * Wl
        row_off += Hl + 2
    return rows, off_in, row_off


def _fwd_kernel(loc_ref, attn_ref, vpad_ref, out_ref, *, layout, max_wpd, P, Qt, D):
    # vpad comes pre-built from host XLA (Mosaic cannot merge lane dims
    # in-kernel): (ΣHp, max_Wp*D) zero-bordered row-major level blocks.
    loc = loc_ref[0, 0]                            # (Qt, L, P, 2)
    attn = attn_ref[0, 0]                          # (Qt, L, P)

    acc = jnp.zeros((Qt, D), _F32)
    for lvl, (off_in, row_off, Hl, Wl) in enumerate(layout):
        Hp, Wp = Hl + 2, Wl + 2
        WpD = Wp * D
        iota_h = lax.broadcasted_iota(jnp.int32, (Qt, Hp), 1)
        iota_xd = lax.broadcasted_iota(jnp.int32, (Qt, WpD), 1) // D
        # constant block-identity reduction matrix (WpD, D)
        r_rows = lax.broadcasted_iota(jnp.int32, (WpD, D), 0) % D
        r_cols = lax.broadcasted_iota(jnp.int32, (WpD, D), 1)
        R = (r_rows == r_cols).astype(_F32)

        x = loc[:, lvl, :, 0].astype(_F32) * Wl - 0.5     # (Qt, P)
        y = loc[:, lvl, :, 1].astype(_F32) * Hl - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = x - x0
        ty = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        in_buf = (x0i >= -1) & (x0i <= Wl) & (y0i >= -1) & (y0i <= Hl)
        ybase = jnp.where(in_buf, y0i + 1, -(2 ** 30))    # padded row of corner y0
        xbase = jnp.where(in_buf, x0i + 1, -(2 ** 30))    # padded col of corner x0
        a = attn[:, lvl].astype(_F32)                     # (Qt, P)

        v_l = vpad_ref[0, 0, pl.ds(row_off, Hp), :WpD]    # (Hp, WpD)
        for p in range(P):
            wy = jnp.where(iota_h == ybase[:, p][:, None], (1.0 - ty[:, p] * 1.0)[:, None] * a[:, p][:, None], 0.0)
            wy = wy + jnp.where(iota_h == (ybase[:, p] + 1)[:, None], (ty[:, p] * a[:, p])[:, None], 0.0)
            T = jnp.dot(wy, v_l, preferred_element_type=_F32)          # (Qt, WpD)
            wx = jnp.where(iota_xd == xbase[:, p][:, None], (1.0 - tx[:, p])[:, None], 0.0)
            wx = wx + jnp.where(iota_xd == (xbase[:, p] + 1)[:, None], tx[:, p][:, None], 0.0)
            acc = acc + jnp.dot(T * wx, R, preferred_element_type=_F32)  # (Qt, D)

    out_ref[0, 0] = acc.astype(out_ref.dtype)


def _pick_q_tile(Q, q_tile):
    rounded = ((Q + 127) // 128) * 128
    return min(q_tile, rounded, 128)


def ms_deform_attn_pallas_v2(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    q_tile: int = 128,
) -> jnp.ndarray:
    """Separable fused deformable attention (forward). Same contract as
    ms_deform_attn_xla: returns (B, Q, H*D)."""
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    layout, S_in, total_rows = _layout(tuple(spatial_shapes))
    assert S_in == S
    max_wpd = max((Wl + 2) * D for _, _, _, Wl in layout)

    Qt = _pick_q_tile(Q, q_tile)
    Q_pad = ((Q + Qt - 1) // Qt) * Qt
    locs, attn = sampling_locations, attention_weights
    if Q_pad != Q:
        pad = Q_pad - Q
        locs = jnp.pad(locs, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0), (0, 0)),
                       constant_values=-10.0)
        attn = jnp.pad(attn, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
    nQt = Q_pad // Qt

    # host-side padded buffer: (B, H, ΣHp, max_Wp*D) with zero borders
    v_bh = value.transpose(0, 2, 1, 3)              # (B, H, S, D)
    level_blocks = []
    for off_in, row_off, Hl, Wl in layout:
        blk = v_bh[:, :, off_in : off_in + Hl * Wl, :].reshape(B, H, Hl, Wl * D)
        blk = jnp.pad(
            blk,
            ((0, 0), (0, 0), (1, 1), (D, max_wpd - (Wl + 1) * D)),
        )
        level_blocks.append(blk)
    vpad = jnp.concatenate(level_blocks, axis=2).astype(_F32)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, layout=layout, max_wpd=max_wpd,
                          P=P, Qt=Qt, D=D),
        grid=(B, H, nQt),
        in_specs=[
            pl.BlockSpec((1, 1, Qt, L, P, 2), lambda b, h, q: (b, h, q, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Qt, L, P), lambda b, h, q: (b, h, q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, total_rows, max_wpd), lambda b, h, q: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Qt, D), lambda b, h, q: (b, h, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Q_pad, D), value.dtype),
    )(
        locs.transpose(0, 2, 1, 3, 4, 5),
        attn.transpose(0, 2, 1, 3, 4),
        vpad,
    )
    return out.transpose(0, 2, 1, 3)[:, :Q].reshape(B, Q, H * D)
