"""Transposed-native fused path (ms_deform_attn_fused_t + the model-side
pre-transposed projections) vs the legacy fused entry, interpret mode.

The T path must be numerically identical (same kernel, same math, only the
staging layout differs) in both the forward and the backward.
"""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from poet_tpu.ops.deform_attn_pallas_v3 import (
    _QT,
    ms_deform_attn_fused,
    ms_deform_attn_fused_t,
    ms_deform_attn_fused_t2,
)

SHAPES = ((10, 14), (5, 7), (3, 4))


def _interpret():
    return pltpu.force_tpu_interpret_mode()


def _make(rng, B=2, H=4, D=8, P=3, Q=40):
    L = len(SHAPES)
    S = sum(h * w for h, w in SHAPES)
    value = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(0.05, 0.95, (B, Q, H, L, P, 2)), jnp.float32)
    attn = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((B, Q, H, L, P)), jnp.float32)
        .reshape(B, Q, H, L * P), axis=-1).reshape(B, Q, H, L, P)
    return value, loc, attn


def _to_T(loc, attn):
    B, Q = loc.shape[:2]
    Q_pad = -(-Q // _QT) * _QT
    locT = loc.reshape(B, Q, -1)
    attnT = attn.reshape(B, Q, -1)
    pad = ((0, 0), (0, Q_pad - Q), (0, 0))
    locT = jnp.pad(locT, pad).transpose(0, 2, 1)
    attnT = jnp.pad(attnT, pad).transpose(0, 2, 1)
    return locT, attnT, Q_pad


def test_fused_t_matches_legacy(rng):
    value, loc, attn = _make(rng)
    locT, attnT, _ = _to_T(loc, attn)
    with _interpret():
        ref = ms_deform_attn_fused(value, SHAPES, loc, attn)
        out = ms_deform_attn_fused_t(value, SHAPES, locT, attnT)[:, : loc.shape[1]]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_t_grads_match_legacy(rng):
    value, loc, attn = _make(rng, Q=24)
    Q = loc.shape[1]

    def f_legacy(value, loc, attn):
        return jnp.sum(jnp.sin(
            ms_deform_attn_fused(value, SHAPES, loc, attn)))

    def f_t(value, loc, attn):
        locT, attnT, _ = _to_T(loc, attn)
        return jnp.sum(jnp.sin(
            ms_deform_attn_fused_t(value, SHAPES, locT, attnT)[:, :Q]))

    with _interpret():
        g_ref = jax.grad(f_legacy, argnums=(0, 1, 2))(value, loc, attn)
        g_t = jax.grad(f_t, argnums=(0, 1, 2))(value, loc, attn)
    for a, b in zip(g_t, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_model_t_path_matches_mxu(rng):
    """MSDeformAttn with impl='fused' (the T-native module path) against
    impl='mxu' on identical params — projections, softmax, reference-point
    math, and the kernel all agree through the module interface."""
    from poet_tpu.models.transformer import MSDeformAttn

    B, Q, C = 2, 30, 64
    L = len(SHAPES)
    S = sum(h * w for h, w in SHAPES)
    x = jnp.asarray(rng.standard_normal((B, S, C)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, Q, C)), jnp.float32)
    ref = jnp.asarray(rng.uniform(0.1, 0.9, (B, Q, L, 2)), jnp.float32)

    mxu = MSDeformAttn(C, L, 4, 3, impl="mxu")
    params = mxu.init(jax.random.PRNGKey(0), q, ref, x, SHAPES)
    # non-trivial projections (inits are zeros)
    rng2 = np.random.default_rng(7)
    for name in ("sampling_offsets", "attention_weights"):
        leaf = params["params"][name]
        leaf["kernel"] = jnp.asarray(
            rng2.standard_normal(leaf["kernel"].shape) * 0.1, jnp.float32)
    out_ref = mxu.apply(params, q, ref, x, SHAPES)

    fused = MSDeformAttn(C, L, 4, 3, impl="fused")
    with _interpret():
        params_t = fused.init(jax.random.PRNGKey(0), q, ref, x, SHAPES)
        out_t = fused.apply(params, q, ref, x, SHAPES)
    assert (jax.tree_util.tree_structure(params_t)
            == jax.tree_util.tree_structure(params))
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_ref),
                               atol=2e-4, rtol=2e-4)


def test_fused_t_padded_token_axis(rng):
    """Encoder case: the token axis is pre-padded to the query tile
    (S > sum of level extents). Forward must ignore the tail; d_value must
    come back padded with exact zeros for the tail rows."""
    B, H, D, P, Q = 2, 4, 8, 3, 40
    L = len(SHAPES)
    S_lv = sum(h * w for h, w in SHAPES)
    S = S_lv + 9
    value_p = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    value = value_p[:, :S_lv]
    loc = jnp.asarray(rng.uniform(0.05, 0.95, (B, Q, H, L, P, 2)), jnp.float32)
    attn = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((B, Q, H, L, P)), jnp.float32)
        .reshape(B, Q, H, L * P), axis=-1).reshape(B, Q, H, L, P)
    locT, attnT, _ = _to_T(loc, attn)

    def f_pad(v):
        return jnp.sum(jnp.sin(
            ms_deform_attn_fused_t(v, SHAPES, locT, attnT)[:, :Q]))

    def f_ref(v):
        return jnp.sum(jnp.sin(
            ms_deform_attn_fused(v, SHAPES, loc, attn)))

    with _interpret():
        out_pad = ms_deform_attn_fused_t(value_p, SHAPES, locT, attnT)[:, :Q]
        out_ref = ms_deform_attn_fused(value, SHAPES, loc, attn)
        g_pad = jax.grad(f_pad)(value_p)
        g_ref = jax.grad(f_ref)(value)
    np.testing.assert_allclose(np.asarray(out_pad), np.asarray(out_ref),
                               atol=1e-5, rtol=1e-5)
    assert g_pad.shape == value_p.shape
    np.testing.assert_allclose(np.asarray(g_pad[:, :S_lv]),
                               np.asarray(g_ref), atol=2e-4, rtol=2e-4)
    np.testing.assert_array_equal(np.asarray(g_pad[:, S_lv:]), 0.0)


def test_fused_t2_matches_t(rng):
    """T2 (kernel-native (B, H*D, Q_pad) result) is the T entry's output
    transposed — values identical, forward and backward."""
    value, loc, attn = _make(rng, Q=24)
    Q = loc.shape[1]
    locT, attnT, Q_pad = _to_T(loc, attn)
    B, _, H, D = value.shape
    with _interpret():
        out_t = ms_deform_attn_fused_t(value, SHAPES, locT, attnT)
        out_t2 = ms_deform_attn_fused_t2(value, SHAPES, locT, attnT)
    assert out_t2.shape == (B, H * D, Q_pad)
    assert out_t2.dtype == value.dtype
    np.testing.assert_allclose(
        np.asarray(out_t2).transpose(0, 2, 1), np.asarray(out_t),
        atol=1e-6, rtol=1e-6)

    def f_t(value, loc, attn):
        lT, aT, _ = _to_T(loc, attn)
        return jnp.sum(jnp.sin(
            ms_deform_attn_fused_t(value, SHAPES, lT, aT)[:, :Q]))

    def f_t2(value, loc, attn):
        lT, aT, _ = _to_T(loc, attn)
        return jnp.sum(jnp.sin(
            ms_deform_attn_fused_t2(value, SHAPES, lT, aT)
            .transpose(0, 2, 1)[:, :Q]))

    with _interpret():
        g_t = jax.grad(f_t, argnums=(0, 1, 2))(value, loc, attn)
        g_t2 = jax.grad(f_t2, argnums=(0, 1, 2))(value, loc, attn)
    for a, b in zip(g_t2, g_t):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_fused_t2_bf16_output_dtype(rng):
    """bf16 value -> bf16 kernel output (the in-kernel cast), matching the
    T entry's XLA-side astype to <= 1 ulp."""
    value, loc, attn = _make(rng)
    locT, attnT, _ = _to_T(loc, attn)
    v16 = value.astype(jnp.bfloat16)
    with _interpret():
        out_t = ms_deform_attn_fused_t(v16, SHAPES, locT, attnT)
        out_t2 = ms_deform_attn_fused_t2(v16, SHAPES, locT, attnT)
    assert out_t2.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out_t2.transpose(0, 2, 1), dtype=np.float32),
        np.asarray(out_t, dtype=np.float32), atol=1e-2, rtol=1e-2)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
