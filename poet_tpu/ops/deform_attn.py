"""Multi-scale deformable attention sampling core — pure-XLA implementation.

This is the TPU-native equivalent of the Deformable-DETR CUDA op
`MSDeformAttnFunction` that the reference imports (external dependency; used
at models/deformable_transformer.py:24,177,201,248) — the single hot kernel of
the whole model. Semantics match the CUDA/`grid_sample` reference:

  * sampling locations are normalized to [0, 1] per level,
  * bilinear interpolation with `align_corners=False` pixel mapping
    (pix = loc * size - 0.5) and ZERO padding outside the feature map,
  * output = sum over (levels, points) of attention_weight * sampled value.

Design: spatial shapes are STATIC (Python ints) so XLA sees fixed shapes and
can fuse the per-level gathers; the per-level corner gathers are expressed as
one `take_along_axis` of all (point, corner) indices at once, which lowers to
a single fused gather per level. Fully differentiable via autodiff — this is
both the correctness reference for the Pallas kernel and the fallback path.

A fused Pallas TPU kernel lives in `poet_tpu.ops.deform_attn_pallas`.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def ms_deform_attn_xla(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Multi-scale deformable attention (pure XLA).

    Args:
      value: (B, S, H, D) flattened multi-level features; S = sum(Hl * Wl).
        Padded positions must already be zeroed (the module masks them).
      spatial_shapes: static list of (Hl, Wl) per level, sum(Hl*Wl) == S.
      sampling_locations: (B, Q, H, L, P, 2) in [0, 1], (x, y) order.
      attention_weights: (B, Q, H, L, P), softmax-normalized over (L, P).

    Returns:
      (B, Q, H * D) attended features.
    """
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    assert len(spatial_shapes) == L
    assert sum(h * w for h, w in spatial_shapes) <= S  # trailing pad tokens OK

    dtype = value.dtype
    out = jnp.zeros((B, Q, H, D), dtype=jnp.promote_types(dtype, jnp.float32))

    start = 0
    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        value_l = value[:, start : start + Hl * Wl]          # (B, Hl*Wl, H, D)
        start += Hl * Wl

        loc = sampling_locations[:, :, :, lvl]               # (B, Q, H, P, 2)
        w_attn = attention_weights[:, :, :, lvl]             # (B, Q, H, P)

        # grid_sample align_corners=False pixel mapping.
        x = loc[..., 0] * Wl - 0.5                           # (B, Q, H, P)
        y = loc[..., 1] * Hl - 0.5

        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = (x - x0).astype(dtype)
        ty = (y - y0).astype(dtype)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        # 4 corners: (y0,x0), (y0,x1), (y1,x0), (y1,x1)
        corner_dx = jnp.array([0, 1, 0, 1], dtype=jnp.int32)
        corner_dy = jnp.array([0, 0, 1, 1], dtype=jnp.int32)
        cx = x0i[..., None] + corner_dx                      # (B, Q, H, P, 4)
        cy = y0i[..., None] + corner_dy

        in_bounds = (cx >= 0) & (cx < Wl) & (cy >= 0) & (cy < Hl)
        cxc = jnp.clip(cx, 0, Wl - 1)
        cyc = jnp.clip(cy, 0, Hl - 1)
        flat_idx = cyc * Wl + cxc                            # (B, Q, H, P, 4)

        # Bilinear corner weights, zeroed outside the map (zero padding).
        wx = jnp.stack([1.0 - tx, tx, 1.0 - tx, tx], axis=-1)
        wy = jnp.stack([1.0 - ty, 1.0 - ty, ty, ty], axis=-1)
        w_corner = wx * wy * in_bounds.astype(dtype)         # (B, Q, H, P, 4)

        # One fused gather for all (point, corner) pairs of this level:
        # indices (B, Q*P*4, H, 1) against value_l (B, S_l, H, D).
        idx = jnp.transpose(flat_idx, (0, 1, 3, 4, 2))       # (B, Q, P, 4, H)
        idx = idx.reshape(B, Q * P * 4, H, 1)
        gathered = jnp.take_along_axis(value_l, idx, axis=1) # (B, Q*P*4, H, D)
        gathered = gathered.reshape(B, Q, P, 4, H, D)
        gathered = jnp.transpose(gathered, (0, 1, 4, 2, 3, 5))  # (B, Q, H, P, 4, D)

        # Combine bilinear corner weights with attention weights and reduce.
        w_total = w_corner * w_attn[..., None]               # (B, Q, H, P, 4)
        out = out + jnp.einsum(
            "bqhpc,bqhpcd->bqhd", w_total.astype(jnp.float32), gathered.astype(jnp.float32)
        )

    return out.reshape(B, Q, H * D).astype(dtype)


def ms_deform_attn_mxu(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    q_chunk: int = 256,
) -> jnp.ndarray:
    """Multi-scale deformable attention via one-hot matmuls (MXU gather).

    TPU has no fast random-gather: `jnp.take_along_axis` lowers to a scalar
    gather loop and measured ~450 ms/batch on the PoET encoder. This
    formulation replaces the gather with dense matrix products that ride the
    MXU systolic array:

      For each level, fold the (point, corner) bilinear weights, zero-padding
      mask, and attention weights into ONE dense sampling matrix
          Wmat[b, q, h, s] = Σ_{p,c} w[b,q,h,p,c] · 1[idx[b,q,h,p,c] == s]
      and compute  out = Wmat @ value_l  — a batched (Q × S_l) x (S_l × D)
      matmul. The one-hot comparison + slot-sum fuses into a single VPU pass;
      the matmul runs at MXU speed. Extra FLOPs vs a true gather are ~Q·S_l·D
      per level — trivially cheap on TPU, and fully differentiable by
      autodiff (the backward is the transposed matmul: the d_value "scatter"
      also becomes a matmul).

    Numerics identical to `ms_deform_attn_xla` (same bilinear/zero-pad math;
    verified in tests). Queries are processed in `q_chunk` slices via lax.map
    to bound the Wmat working set (chunk × S_l floats).
    """
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    assert len(spatial_shapes) == L
    assert sum(h * w for h, w in spatial_shapes) <= S  # trailing pad tokens OK

    dtype = value.dtype
    f32 = jnp.float32

    # pad Q to a multiple of q_chunk
    qc = min(q_chunk, Q)
    Q_pad = ((Q + qc - 1) // qc) * qc
    if Q_pad != Q:
        pad = Q_pad - Q
        sampling_locations = jnp.pad(
            sampling_locations, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0), (0, 0)),
            constant_values=-10.0,  # far outside -> zero contribution
        )
        attention_weights = jnp.pad(
            attention_weights, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0))
        )
    n_chunks = Q_pad // qc

    out = jnp.zeros((B, Q_pad, H, D), dtype=f32)
    start = 0
    corner_dx = jnp.array([0, 1, 0, 1], dtype=jnp.int32)
    corner_dy = jnp.array([0, 0, 1, 1], dtype=jnp.int32)

    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        S_l = Hl * Wl
        value_l = value[:, start : start + S_l]              # (B, S_l, H, D)
        start += S_l

        loc = sampling_locations[:, :, :, lvl]               # (B, Qp, H, P, 2)
        attn = attention_weights[:, :, :, lvl]               # (B, Qp, H, P)

        x = loc[..., 0].astype(f32) * Wl - 0.5
        y = loc[..., 1].astype(f32) * Hl - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = x - x0
        ty = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        cx = x0i[..., None] + corner_dx                      # (B, Qp, H, P, 4)
        cy = y0i[..., None] + corner_dy
        in_bounds = (cx >= 0) & (cx < Wl) & (cy >= 0) & (cy < Hl)
        idx = jnp.clip(cy, 0, Hl - 1) * Wl + jnp.clip(cx, 0, Wl - 1)

        wx = jnp.stack([1.0 - tx, tx, 1.0 - tx, tx], axis=-1)
        wy = jnp.stack([1.0 - ty, 1.0 - ty, ty, ty], axis=-1)
        wgt = wx * wy * in_bounds.astype(f32) * attn[..., None].astype(f32)

        # fold (P, 4) into one slot axis
        idx = idx.reshape(B, Q_pad, H, P * 4)
        wgt = wgt.reshape(B, Q_pad, H, P * 4)

        # chunked one-hot matmul
        idx_c = idx.reshape(B, n_chunks, qc, H, P * 4).transpose(1, 0, 2, 3, 4)
        wgt_c = wgt.reshape(B, n_chunks, qc, H, P * 4).transpose(1, 0, 2, 3, 4)
        iota = jnp.arange(S_l, dtype=jnp.int32)

        def chunk_fn(args, _v=None, _iota=iota):
            i_c, w_c = args                                   # (B, qc, H, P4)
            # (B, qc, H, P4, S_l) one-hot, weighted, summed over slots — XLA
            # fuses the compare/select/reduce into one pass (no materialize).
            # The select + reduce run in the value dtype: with bf16 values the
            # whole Wmat construction and its HBM traffic halve.
            wmat = jnp.sum(
                jnp.where(i_c[..., None] == _iota, w_c[..., None].astype(dtype),
                          jnp.zeros((), dtype)),
                axis=3, dtype=dtype,
            )                                                 # (B, qc, H, S_l)
            return jnp.einsum(
                "bqhs,bshd->bqhd", wmat, value_l,
                preferred_element_type=f32,
            )

        if n_chunks == 1:
            contrib = chunk_fn((idx_c[0], wgt_c[0]))[None]
        else:
            contrib = lax.map(chunk_fn, (idx_c, wgt_c))      # (n_chunks, B, qc, H, D)
        contrib = contrib.transpose(1, 0, 2, 3, 4).reshape(B, Q_pad, H, D)
        out = out + contrib

    return out[:, :Q].reshape(B, Q, H * D).astype(dtype)


def ms_deform_attn_patch(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    q_chunk: int = 1024,
) -> jnp.ndarray:
    """Multi-scale deformable attention via 2x2-patch gathers.

    The `ms_deform_attn_mxu` one-hot formulation is VPU/gather-bound: XLA
    lowers it to ~B*Q*H*L*P*4 single-row gathers (measured ~19 ms per encoder
    layer at the paper config). This formulation instead zero-pads each level
    by one pixel on every side and gathers the full 2x2 bilinear patch in ONE
    gather slice per (b, h, q, p) — 4x fewer, wider gather rows — then folds
    bilinear corner weights + zero-pad masking + attention weights in a single
    VPU contraction. Numerics identical to `ms_deform_attn_xla` (same
    align_corners=False mapping and zero padding; tested).

    Queries are processed in `q_chunk` slices via lax.map so the gathered
    patches (B*H*q_chunk*P*4*D elements per level) never exceed a bounded
    working set.

    WARNING: forward-only in practice. The autodiff transpose of the batched
    `lax.gather` is a scatter-add that triggered a TPU worker crash (kernel
    fault) when benchmarked at encoder shapes (2026-08-16, v5e). The
    production paths (`sep` encoder / `mxu` decoder) differentiate cleanly —
    their backward is transposed matmuls; this formulation is kept for
    inference experiments and as documentation of the measured ladder.

    Args/returns: see `ms_deform_attn_xla`.
    """
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    assert len(spatial_shapes) == L
    assert sum(h * w for h, w in spatial_shapes) <= S  # trailing pad tokens OK

    dtype = value.dtype
    f32 = jnp.float32

    # (B, H, Hl+2, Wl+2, D) zero-padded level maps, heads leading so the
    # gather batches over (B, H). Built once, shared by all query chunks.
    value_pads = []
    start = 0
    for Hl, Wl in spatial_shapes:
        v = value[:, start : start + Hl * Wl].reshape(B, Hl, Wl, H, D)
        start += Hl * Wl
        value_pads.append(
            jnp.pad(v.transpose(0, 3, 1, 2, 4),
                    ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        )

    # pad Q to a multiple of q_chunk
    qc = min(q_chunk, Q)
    Q_pad = ((Q + qc - 1) // qc) * qc
    if Q_pad != Q:
        pad = Q_pad - Q
        sampling_locations = jnp.pad(
            sampling_locations,
            ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0), (0, 0)),
        )
        attention_weights = jnp.pad(
            attention_weights, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0))
        )
    n_chunks = Q_pad // qc
    loc_c = sampling_locations.reshape(B, n_chunks, qc, H, L, P, 2).transpose(
        1, 0, 2, 3, 4, 5, 6
    )
    attn_c = attention_weights.reshape(B, n_chunks, qc, H, L, P).transpose(
        1, 0, 2, 3, 4, 5
    )

    dn = lax.GatherDimensionNumbers(
        offset_dims=(3, 4, 5),
        collapsed_slice_dims=(),
        start_index_map=(2, 3),
        operand_batching_dims=(0, 1),
        start_indices_batching_dims=(0, 1),
    )

    def chunk_fn(args):
        loc_all, attn_all = args                              # (B, qc, H, L, P, *)
        acc = jnp.zeros((B, qc, H, D), dtype=f32)
        for lvl, (Hl, Wl) in enumerate(spatial_shapes):
            loc = loc_all[:, :, :, lvl]                       # (B, qc, H, P, 2)
            attn = attn_all[:, :, :, lvl]                     # (B, qc, H, P)

            x = loc[..., 0].astype(f32) * Wl - 0.5
            y = loc[..., 1].astype(f32) * Hl - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            tx = x - x0
            ty = y - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)

            # Patch start in padded coords, clamped so the 2x2 slice stays in
            # bounds (PROMISE_IN_BOUNDS). True out-of-map corners get zero
            # weight below, so clamped reads of wrong cells never contribute.
            ys = jnp.clip(y0i + 1, 0, Hl)                     # Hp - 2 = Hl
            xs = jnp.clip(x0i + 1, 0, Wl)

            idx = jnp.stack([ys, xs], axis=-1)                # (B, qc, H, P, 2)
            idx = idx.transpose(0, 2, 1, 3, 4).reshape(B, H, qc * P, 2)
            patches = lax.gather(
                value_pads[lvl], idx, dn, slice_sizes=(1, 1, 2, 2, D),
                mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )                                                 # (B, H, qc*P, 2, 2, D)
            patches = patches.reshape(B, H, qc, P, 2, 2, D)

            # Corner weights: bilinear x zero-pad mask x attention. An
            # in-bounds corner (0 <= y0+i < Hl) implies the patch start was
            # NOT clamped, so patch cell i is exactly that corner; clamped
            # patches only occur when every affected corner is out of bounds
            # and therefore zero-weighted.
            cy = y0i[..., None] + jnp.array([0, 1], jnp.int32)  # (B, qc, H, P, 2)
            cx = x0i[..., None] + jnp.array([0, 1], jnp.int32)
            my = (cy >= 0) & (cy < Hl)
            mx = (cx >= 0) & (cx < Wl)
            wy = jnp.stack([1.0 - ty, ty], axis=-1) * my.astype(f32)
            wx = jnp.stack([1.0 - tx, tx], axis=-1) * mx.astype(f32)
            w = (
                wy[..., :, None] * wx[..., None, :]
                * attn[..., None, None].astype(f32)
            )                                                 # (B, qc, H, P, 2, 2)
            w = w.transpose(0, 2, 1, 3, 4, 5).astype(dtype)   # (B, H, qc, P, 2, 2)

            acc = acc + jnp.einsum(
                "bhqpij,bhqpijd->bqhd", w, patches, preferred_element_type=f32
            )
        return acc

    if n_chunks == 1:
        out = chunk_fn((loc_c[0], attn_c[0]))[None]
    else:
        out = lax.map(chunk_fn, (loc_c, attn_c))              # (n_chunks, B, qc, H, D)
    out = out.transpose(1, 0, 2, 3, 4).reshape(B, Q_pad, H, D)
    return out[:, :Q].reshape(B, Q, H * D).astype(dtype)


def ms_deform_attn_sep(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    q_chunk: int = 1600,
) -> jnp.ndarray:
    """Multi-scale deformable attention via SEPARABLE one-hot matmuls.

    The `ms_deform_attn_mxu` formulation builds one dense sampling matrix per
    level with a (Q, H, L*P*4, S_l) compare domain — VPU-bound. Bilinear
    sampling is separable, so the row/column selections factor into TWO
    rank-2-per-point one-hot operators with tiny compare domains
    (Q*H*P*2*(Hl + Wl)) and the heavy lifting moves to the MXU:

        x-mix:  G[q,p,y,d] = sum_x  Bx[q,p,x]   * V[y,x,d]     (matmul)
        y-mix:  out[q,d]  += sum_py Ay[q,p,y]   * G[q,p,y,d]   (fma reduce)

    with attention weights folded into Ay. Zero-padding semantics preserved by
    masking out-of-bounds corner weights (numerics identical to
    `ms_deform_attn_xla`; tested). Queries processed in `q_chunk` slices via
    lax.map to bound the (B, qc, H, P, Hl, D) intermediate.
    """
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    assert len(spatial_shapes) == L
    assert sum(h * w for h, w in spatial_shapes) <= S  # trailing pad tokens OK

    dtype = value.dtype
    f32 = jnp.float32

    # per-level maps (B, Hl, Wl, H, D) -> (B, H, Hl, Wl, D)
    value_ls = []
    start = 0
    for Hl, Wl in spatial_shapes:
        v = value[:, start : start + Hl * Wl].reshape(B, Hl, Wl, H, D)
        start += Hl * Wl
        value_ls.append(v.transpose(0, 3, 1, 2, 4))

    qc = min(q_chunk, Q)
    Q_pad = ((Q + qc - 1) // qc) * qc
    if Q_pad != Q:
        pad = Q_pad - Q
        sampling_locations = jnp.pad(
            sampling_locations,
            ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0), (0, 0)),
            constant_values=-10.0,
        )
        attention_weights = jnp.pad(
            attention_weights, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0))
        )
    n_chunks = Q_pad // qc
    # LEVEL-LEADING layout: slicing the level mid-dim of a (B, Q, H, L, P, 2)
    # tensor lowered to pathological strided DMAs (~1 ms each, 20+ per layer
    # in the profile); one transpose up front makes every per-level slice a
    # free leading-dim view.
    loc_c = sampling_locations.reshape(B, n_chunks, qc, H, L, P, 2).transpose(
        1, 4, 0, 2, 3, 5, 6
    )                                                   # (n_chunks, L, B, qc, H, P, 2)
    attn_c = attention_weights.reshape(B, n_chunks, qc, H, L, P).transpose(
        1, 4, 0, 2, 3, 5
    )                                                   # (n_chunks, L, B, qc, H, P)

    # In bf16, keep the x-mix intermediate g in bf16 too: g is the dominant
    # HBM term of the whole encoder (B*Q*H*P*Hl*D floats PER LEVEL — ~6 GB/
    # layer at the paper config in f32) and the final y-mix still accumulates
    # in f32.
    g_dtype = dtype if dtype == jnp.bfloat16 else f32

    def chunk_fn(args):
        loc_all, attn_all = args                          # (L, B, qc, H, P, *)
        acc = jnp.zeros((B, qc, H, D), dtype=f32)
        for lvl, (Hl, Wl) in enumerate(spatial_shapes):
            loc = loc_all[lvl]                            # (B, qc, H, P, 2)
            attn = attn_all[lvl]                          # (B, qc, H, P)

            x = loc[..., 0].astype(f32) * Wl - 0.5
            y = loc[..., 1].astype(f32) * Hl - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            tx = x - x0
            ty = y - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)

            iota_x = jnp.arange(Wl, dtype=jnp.int32)
            iota_y = jnp.arange(Hl, dtype=jnp.int32)
            # (B, qc, H, P, Wl): two weighted nonzeros per row
            bx = (
                jnp.where(x0i[..., None] == iota_x, (1.0 - tx)[..., None], 0.0)
                + jnp.where((x0i + 1)[..., None] == iota_x, tx[..., None], 0.0)
            )
            # attention weight + ty folded into the y operator
            ay = (
                jnp.where(y0i[..., None] == iota_y, (1.0 - ty)[..., None], 0.0)
                + jnp.where((y0i + 1)[..., None] == iota_y, ty[..., None], 0.0)
            ) * attn[..., None].astype(f32)

            # x-mix on the MXU, y-mix as an fma reduction
            g = jnp.einsum(
                "bqhpx,bhyxd->bqhpyd", bx.astype(dtype), value_ls[lvl],
                preferred_element_type=g_dtype,
            )
            acc = acc + jnp.einsum(
                "bqhpy,bqhpyd->bqhd", ay.astype(g_dtype), g,
                preferred_element_type=f32,
            )
        return acc

    if n_chunks == 1:
        out = chunk_fn((loc_c[0], attn_c[0]))[None]
    else:
        out = lax.map(chunk_fn, (loc_c, attn_c))
    out = out.transpose(1, 0, 2, 3, 4).reshape(B, Q_pad, H, D)
    return out[:, :Q].reshape(B, Q, H * D).astype(dtype)


# ---------------------------------------------------------------------------
# sep with a hand-derived backward — the separability trick applied to the
# adjoint.
# ---------------------------------------------------------------------------

def _sep_onehot_factors(loc, attn, Hl, Wl):
    """Recompute the per-level one-hot factors of the sep forward.

    Returns (bx, wy, ay, aux) with
      bx (B, Q, H, P, Wl): x-interpolation operator incl. OOB masking,
      wy (B, Q, H, P, Hl): y-interpolation operator WITHOUT attention,
      ay = wy * attn,
      aux = (dbx_dtx, dwy_dty): masked one-hot DIFFERENCES used by the
      backward (d bx / d tx and d wy / d ty).
    """
    f32 = jnp.float32
    x = loc[..., 0].astype(f32) * Wl - 0.5
    y = loc[..., 1].astype(f32) * Hl - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    iota_x = jnp.arange(Wl, dtype=jnp.int32)
    iota_y = jnp.arange(Hl, dtype=jnp.int32)
    # masked one-hots: an out-of-map corner index matches no iota slot, so
    # its weight is implicitly zero — identical zero-padding semantics to
    # ms_deform_attn_sep / _xla.
    oh_x0 = (x0i[..., None] == iota_x).astype(f32)
    oh_x1 = ((x0i + 1)[..., None] == iota_x).astype(f32)
    oh_y0 = (y0i[..., None] == iota_y).astype(f32)
    oh_y1 = ((y0i + 1)[..., None] == iota_y).astype(f32)

    bx = oh_x0 * (1.0 - tx)[..., None] + oh_x1 * tx[..., None]
    wy = oh_y0 * (1.0 - ty)[..., None] + oh_y1 * ty[..., None]
    ay = wy * attn[..., None].astype(f32)
    return bx, wy, ay, (oh_x1 - oh_x0, oh_y1 - oh_y0)


def _sep_cv_fwd(value, spatial_shapes, sampling_locations, attention_weights,
                q_chunk):
    out = ms_deform_attn_sep(value, spatial_shapes, sampling_locations,
                             attention_weights, q_chunk=q_chunk)
    return out, (value, sampling_locations, attention_weights)


def _sep_cv_bwd(spatial_shapes, q_chunk, res, dout):
    """Adjoint of multi-scale deformable sampling, separably.

    Autodiff of the sep forward routes every input cotangent through the
    (B, Q, H, P, Hl, D) intermediate `g` — three O(Q·P·S·D) einsums plus a
    layout-transposed 2.5 GB copy of g per encoder layer (measured; see
    README). The same separability that collapses the forward collapses the
    adjoint instead through two SMALL intermediates per level:

        T[q, y, x]  = Σ_d dout[q, d] · V[y, x, d]          (O(Q·S·D))
        W2[q, y, x] = Σ_p ay[q, p, y] · bx[q, p, x]        (O(Q·P·S), no D)

        d_V   = Σ_q W2 · dout                              (O(Q·S·D))
        U     = Σ_x T · (oh(x0+1) − oh(x0))   → d_tx = Σ_y ay · U
        R     = Σ_x T · bx                    → d_ty = Σ_y attn·Δoh_y · R
                                                d_attn = Σ_y wy · R
    Total ≈ 2·Q·S·D + 3·Q·P·S MACs — ~6× fewer than the autodiff path, and
    nothing of size Q·P·S·D exists. d_loc folds the level normalizer
    (∂x/∂loc_x = Wl); floor() contributes zero gradient, exactly like
    autodiff.

    MEASURED NEGATIVE RESULT (2026-08-17, v5e, bs=16 paper config): the
    MAC-count win does not survive contact with the MXU — T's d-contraction
    has K = D = 16 (12.5% utilization) and d_value's q-contraction feeds a
    (B,Q,H,Hl,Wl) operand pair, so the full train step measured 681 ms vs
    180 ms with autodiff's backward, whose transposed einsums have better
    contraction shapes (K = Wl or Hl·D). There is no associativity order of
    this adjoint in which every contraction is MXU-shaped. Kept as
    `enc_impl='sep_cv'` with exact-gradient tests — the analysis is the
    deliverable.
    """
    value, sampling_locations, attention_weights = res
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    f32 = jnp.float32
    dtype = value.dtype

    dout = dout.reshape(B, Q, H, D)

    # per-level value views (B, H, Hl, Wl, D), as in the forward
    value_ls = []
    start = 0
    for Hl, Wl in spatial_shapes:
        v = value[:, start: start + Hl * Wl].reshape(B, Hl, Wl, H, D)
        start += Hl * Wl
        value_ls.append(v.transpose(0, 3, 1, 2, 4))

    qc = min(q_chunk, Q)
    Q_pad = ((Q + qc - 1) // qc) * qc
    locs, attn = sampling_locations, attention_weights
    dout_p = dout
    if Q_pad != Q:
        pad = Q_pad - Q
        locs = jnp.pad(locs, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0), (0, 0)),
                       constant_values=-10.0)
        attn = jnp.pad(attn, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
        dout_p = jnp.pad(dout, ((0, 0), (0, pad), (0, 0), (0, 0)))
    n_chunks = Q_pad // qc

    loc_c = locs.reshape(B, n_chunks, qc, H, L, P, 2).transpose(1, 4, 0, 2, 3, 5, 6)
    attn_c = attn.reshape(B, n_chunks, qc, H, L, P).transpose(1, 4, 0, 2, 3, 5)
    dout_c = dout_p.reshape(B, n_chunks, qc, H, D).transpose(1, 0, 2, 3, 4)

    def chunk_bwd(args):
        loc_all, attn_all, do = args          # (L, B, qc, H, P, *), (B, qc, H, D)
        d_value_parts = []
        d_loc_parts = []
        d_attn_parts = []
        for lvl, (Hl, Wl) in enumerate(spatial_shapes):
            loc = loc_all[lvl]
            a = attn_all[lvl]
            bx, wy, ay, (dbx, dwy) = _sep_onehot_factors(loc, a, Hl, Wl)
            v_l = value_ls[lvl]               # (B, H, Hl, Wl, D)

            # T: contraction over d — bf16 inputs, f32 accumulate, bf16 store
            T = jnp.einsum("bqhd,bhyxd->bqhyx", do.astype(dtype), v_l,
                           preferred_element_type=f32).astype(dtype)
            # W2: p-folded sampling weights (K = P = 4; XLA fuses)
            W2 = jnp.einsum("bqhpy,bqhpx->bqhyx", ay.astype(dtype),
                            bx.astype(dtype), preferred_element_type=f32)
            # d_value: contraction over q
            dv = jnp.einsum("bqhyx,bqhd->bhyxd", W2.astype(dtype),
                            do.astype(dtype), preferred_element_type=f32)
            d_value_parts.append(dv)

            U = jnp.einsum("bqhyx,bqhpx->bqhpy", T, dbx.astype(dtype),
                           preferred_element_type=f32)
            R = jnp.einsum("bqhyx,bqhpx->bqhpy", T, bx.astype(dtype),
                           preferred_element_type=f32)
            d_tx = jnp.sum(ay * U, axis=-1)                   # (B, qc, H, P)
            d_ty = jnp.sum((a[..., None].astype(f32) * dwy) * R, axis=-1)
            d_attn_l = jnp.sum(wy * R, axis=-1)
            # x = loc_x * Wl - 0.5 → ∂/∂loc_x = Wl (floor() has zero grad)
            d_loc_l = jnp.stack([d_tx * Wl, d_ty * Hl], axis=-1)
            d_loc_parts.append(d_loc_l)
            d_attn_parts.append(d_attn_l)
        return (d_value_parts, jnp.stack(d_loc_parts, axis=3),
                jnp.stack(d_attn_parts, axis=3))

    if n_chunks == 1:
        dv_parts, d_loc, d_attn = chunk_bwd((loc_c[0], attn_c[0], dout_c[0]))
        dv_parts = [p[None] for p in dv_parts]
        d_loc, d_attn = d_loc[None], d_attn[None]
    else:
        dv_parts, d_loc, d_attn = lax.map(chunk_bwd, (loc_c, attn_c, dout_c))

    # d_value: sum chunk contributions, back to (B, S, H, D) flat layout
    d_value = jnp.concatenate(
        [p.sum(axis=0).transpose(0, 2, 3, 1, 4).reshape(B, -1, H, D)
         for p in dv_parts], axis=1).astype(dtype)
    # d_loc / d_attn: (n_chunks, B, qc, H, L, P[, 2]) → (B, Q, H, L, P[, 2])
    d_loc = d_loc.transpose(1, 0, 2, 3, 4, 5, 6).reshape(B, Q_pad, H, L, P, 2)
    d_attn = d_attn.transpose(1, 0, 2, 3, 4, 5).reshape(B, Q_pad, H, L, P)
    d_loc = d_loc[:, :Q].astype(sampling_locations.dtype)
    d_attn = d_attn[:, :Q].astype(attention_weights.dtype)
    return d_value, d_loc, d_attn


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def ms_deform_attn_sep_cv(value, spatial_shapes, sampling_locations,
                          attention_weights, q_chunk=1600):
    """`ms_deform_attn_sep` with the hand-derived separable backward.

    Identical forward; the adjoint avoids autodiff's O(Q·P·S·D) g-sized
    intermediates (see `_sep_cv_bwd`). Use as the encoder sampling core for
    training; gradients verified against autodiff of the XLA reference.
    """
    return ms_deform_attn_sep(value, spatial_shapes, sampling_locations,
                              attention_weights, q_chunk=q_chunk)


ms_deform_attn_sep_cv.defvjp(
    lambda value, spatial_shapes, loc, attn, q_chunk: _sep_cv_fwd(
        value, spatial_shapes, loc, attn, q_chunk),
    _sep_cv_bwd,
)
