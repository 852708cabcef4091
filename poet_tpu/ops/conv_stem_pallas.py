"""Pallas phase-split direct convolution for small-C "stem" convs.

TPU-native replacement for the network entry convolutions XLA lowers
poorly: the ResNet-50 7x7/stride-2 3-channel stem (reference consumes it
through torchvision's resnet_fpn_backbone, models/backbone_maskrcnn.py:30)
and the YOLOv4-CSP darknet entry convs (3x3/1 3->32, 3x3/2 32->64; cfg
configs/ycbv_yolov4-csp.cfg). Measured on chip: XLA spends 1.75 ms on the
bs=16 ResNet stem against ~0.3 ms of useful MAC+HBM work, and every
reshape-based space-to-depth rewrite loses the win to layout copies XLA
re-inserts (three exact variants measured slower end-to-end; README
"negative result" section). The fix has to own the data movement.

Design — phase-split direct conv:

  * XLA stages the (B, H, W, C) input once into stride-phase planes
    (B, H3, QP, W3) with QP = s*s*C planes indexed q = (hp*s + wp)*C + c,
    where staged[b, i, q, j] = x_padded[b, i*s + hp, j*s + wp, c]. This is
    ONE well-laid-out transpose (minor dim W3 = the plane width, hundreds
    of lanes) of the smallest tensor in the whole stack — unlike the s2d
    reshapes, whose channel-minor (..., 12) layouts are what XLA copies
    around. After the split, an output pixel (oy, ox) reads tap
    (ky, kx, c) at plane q(ky%s, kx%s, c), row oy + ky//s, col ox + kx//s:
    every stride disappears — rows are contiguous, column shifts are
    static lane offsets.
  * the kernel tiles output rows (RT per program). Per tap it moves one
    (RT, Wo) block of the resident staged tile into row k of an
    (RT, Kp, Wo) im2col scratch (static sublane/lane offsets only), then
    contracts K on the MXU per output row: (Kp, Wo)^T-free dot_general
    (((0,), (0,))) against the (Kp, F) weight — K lives on sublanes on
    both sides, the MXU's native streaming orientation.
  * bias + BatchNorm folding + activation (relu / the one-exp mish from
    models/yolov4.py) run on the f32 accumulator in the epilogue, so the
    whole stem is one HBM read + one HBM write.

Inference-only by design: every consumer (ResNet stem inside the frozen
detector, models/backbone.py:36-40 semantics; darknet body) is frozen in
the reference — differentiating through this op raises at trace time.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RT = 8  # output rows per grid step


def _mish_f32(x):
    # same one-exp rewrite as models/yolov4.py:mish (see its docstring)
    xs = jnp.minimum(x, 25.0)
    e = jnp.exp(xs)
    t = 1.0 - 2.0 / ((1.0 + e) * (1.0 + e) + 1.0)
    return jnp.where(x > 25.0, x, x * t)


_ACTS = {None: lambda x: x, "relu": lambda x: jnp.maximum(x, 0.0),
         "mish": _mish_f32,
         "leaky": lambda x: jnp.where(x > 0, x, 0.1 * x)}


def _kernel(staged_hbm, w_ref, b_ref, out_ref, scr, xs, sems, *,
            taps, K, Kp, RTA, Wo, activation, dt):
    b = pl.program_id(0)
    t = pl.program_id(1)

    cp = pltpu.make_async_copy(
        staged_hbm.at[b, pl.ds(t * _RT, RTA)], scr, sems)
    cp.start()
    cp.wait()

    for k, (q, ay, sh) in enumerate(taps):
        xs[:, k, :] = scr[pl.ds(ay, _RT), q, pl.ds(sh, Wo)]
    if Kp > K:
        xs[:, K:Kp, :] = jnp.zeros((_RT, Kp - K, Wo), dt)

    act = _ACTS[activation]
    wk = w_ref[...]
    for j in range(_RT):
        acc = jax.lax.dot_general(
            xs[j], wk, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (Wo, F)
        acc = act(acc + b_ref[0].astype(jnp.float32))
        out_ref[0, j] = acc.astype(out_ref.dtype)


def _no_grad(*args, **kwargs):
    raise NotImplementedError(
        "conv_stem_pallas is inference-only (every consumer is a frozen "
        "backbone entry conv); use lax.conv_general_dilated for training")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _conv_stem(x, w, bias, stride, padding, activation, out_dtype, interpret):
    return _conv_stem_impl(x, w, bias, stride, padding, activation,
                           out_dtype, interpret)


_conv_stem.defvjp(_no_grad, _no_grad)


def _conv_stem_impl(x, w, bias, stride, padding, activation, out_dtype,
                    interpret):
    B, H, W, C = x.shape
    kh, kw, wc, F = w.shape
    assert wc == C, (wc, C)
    s = stride
    (pt, pb), (pl_, pr) = padding
    Ho = (H + pt + pb - kh) // s + 1
    Wo = (W + pl_ + pr - kw) // s + 1
    dt = x.dtype

    QP = s * s * C
    Ay = (kh - 1) // s
    Ax = (kw - 1) // s
    NT = -(-Ho // _RT)
    H3 = NT * _RT + Ay
    W3 = Wo + Ax
    # pad so the phase reshape divides exactly and covers every read
    Hp = max(H + pt + pb, (H3 - 1) * s + 1 + (s - 1))
    Wp = max(W + pl_ + pr, (W3 - 1) * s + 1 + (s - 1))
    Hp = -(-Hp // s) * s
    Wp = -(-Wp // s) * s
    xp = jnp.pad(x, ((0, 0), (pt, Hp - H - pt), (pl_, Wp - W - pl_), (0, 0)))
    # (B, H2, s, W2, s, C) -> (B, H2, s*s*C, W2): plane q = (hp*s + wp)*C + c
    H2, W2 = Hp // s, Wp // s
    staged = xp.reshape(B, H2, s, W2, s, C).transpose(0, 1, 2, 4, 5, 3)
    staged = staged.reshape(B, H2, QP, W2)
    staged = staged[:, :H3, :, :W3]
    # plane dim padded to the sublane tile (8) and plane width to the lane
    # tile (128): the per-tile DMA copies full extents of dims 2/3, and
    # Mosaic requires sliced/partial extents tile-aligned
    QPp = -(-QP // 8) * 8
    W3p = -(-W3 // 128) * 128
    h_now, w_now = staged.shape[1], staged.shape[3]
    if h_now < H3 or w_now < W3p or QPp > QP:
        staged = jnp.pad(
            staged, ((0, 0), (0, H3 - h_now), (0, QPp - QP),
                     (0, W3p - w_now)))

    taps = []
    for ky in range(kh):
        for kx in range(kw):
            for c in range(C):
                q = ((ky % s) * s + (kx % s)) * C + c
                taps.append((q, ky // s, kx // s))
    K = kh * kw * C
    Kp = -(-K // 8) * 8

    wk = jnp.pad(w.reshape(K, F), ((0, Kp - K), (0, 0))).astype(dt)
    bb = (jnp.zeros((F,), jnp.float32) if bias is None
          else bias.astype(jnp.float32)).reshape(1, F)

    RTA = _RT + Ay
    out_dt = out_dtype or dt
    kern = functools.partial(
        _kernel, taps=tuple(taps), K=K, Kp=Kp, RTA=RTA, Wo=Wo,
        activation=activation, dt=dt)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(B, NT),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                  # staged
            vmem((Kp, F), lambda b, t: (0, 0)),                 # weights
            vmem((1, F), lambda b, t: (0, 0)),                  # bias
        ],
        out_specs=vmem((1, _RT, Wo, F), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, NT * _RT, Wo, F), out_dt),
        scratch_shapes=[
            pltpu.VMEM((RTA, QPp, W3p), dt),                    # staged tile
            pltpu.VMEM((_RT, Kp, Wo), dt),                      # im2col block
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(staged, wk, bb)
    return out[:, :Ho]


def conv_stem_pallas(
    x: jnp.ndarray,                    # (B, H, W, C) NHWC
    w: jnp.ndarray,                    # (kh, kw, C, F)
    bias: Optional[jnp.ndarray] = None,
    *,
    stride: int = 1,
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0)),
    activation: Optional[str] = None,  # None | 'relu' | 'mish'
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused small-C stem conv + bias + activation; see module docstring.

    Exact same arithmetic as `lax.conv_general_dilated` (NHWC/HWIO, f32
    accumulation) followed by bias add and activation. Inference-only:
    taking a gradient through it raises."""
    if activation not in _ACTS:
        raise ValueError(f"unknown activation {activation!r}")
    if stride < 1 or x.ndim != 4 or w.ndim != 4:
        raise ValueError("conv_stem_pallas: bad stride/rank")
    return _conv_stem(x, w, bias, stride, padding, activation, out_dtype,
                      interpret)
