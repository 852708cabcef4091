"""Fused separable Pallas kernel (v3) vs the XLA reference (interpret mode).

Covers forward parity (incl. out-of-bounds sampling and query-tile padding),
the custom-VJP gradients against autodiff of `ms_deform_attn_xla`, and edge
level geometries.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from poet_tpu.ops.deform_attn import ms_deform_attn_xla
from tests.test_deform_attn import _make_inputs


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def test_v3_matches_xla(rng):
    from poet_tpu.ops.deform_attn_pallas_v3 import ms_deform_attn_pallas_v3

    value, shapes, locs, w = _make_inputs(rng, B=2, Q=6, H=4, D=8)
    a = np.asarray(ms_deform_attn_xla(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
    b = np.asarray(ms_deform_attn_pallas_v3(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
    np.testing.assert_allclose(a, b, atol=2e-5)


@pytest.mark.slow
def test_v3_multi_tile(rng):
    from poet_tpu.ops.deform_attn_pallas_v3 import ms_deform_attn_pallas_v3

    value, shapes, locs, w = _make_inputs(rng, B=1, Q=300, H=2, D=8)
    a = np.asarray(ms_deform_attn_xla(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
    b = np.asarray(ms_deform_attn_pallas_v3(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_v3_edge_levels(rng):
    from poet_tpu.ops.deform_attn_pallas_v3 import ms_deform_attn_pallas_v3

    value, shapes, locs, w = _make_inputs(rng, B=1, Q=5, H=2, D=8,
                                          shapes=((1, 7), (3, 1), (1, 1)))
    a = np.asarray(ms_deform_attn_xla(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
    b = np.asarray(ms_deform_attn_pallas_v3(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
    np.testing.assert_allclose(a, b, atol=2e-5)


@pytest.mark.parametrize("merged", ["0", "1"])
def test_v3_fused_gradients_match_autodiff(rng, monkeypatch, merged):
    """Both adjoint implementations (merged single kernel / two-kernel
    d_value + d_loc split, POET_V3_MERGED_ADJOINT) against XLA autodiff."""
    monkeypatch.setenv("POET_V3_MERGED_ADJOINT", merged)
    from poet_tpu.ops.deform_attn_pallas_v3 import ms_deform_attn_fused

    value, shapes, locs, w = _make_inputs(rng, B=2, Q=7, H=2, D=8,
                                          shapes=((5, 7), (3, 4)))

    def loss_ref(v, l, aw):
        return jnp.sum(jnp.sin(3.0 * ms_deform_attn_xla(v, shapes, l, aw)))

    def loss_v3(v, l, aw):
        return jnp.sum(jnp.sin(3.0 * ms_deform_attn_fused(v, shapes, l, aw)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
    gv = jax.grad(loss_v3, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
    for a, b in zip(gr, gv):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("merged", ["0", "1"])
def test_v3_fused_gradients_multi_tile(rng, monkeypatch, merged):
    monkeypatch.setenv("POET_V3_MERGED_ADJOINT", merged)
    from poet_tpu.ops.deform_attn_pallas_v3 import ms_deform_attn_fused

    value, shapes, locs, w = _make_inputs(rng, B=1, Q=200, H=2, D=8)

    def loss_ref(v, l, aw):
        return jnp.sum(jnp.sin(3.0 * ms_deform_attn_xla(v, shapes, l, aw)))

    def loss_v3(v, l, aw):
        return jnp.sum(jnp.sin(3.0 * ms_deform_attn_fused(v, shapes, l, aw)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
    gv = jax.grad(loss_v3, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
    for a, b in zip(gr, gv):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("ymix_bf16", ["0", "1"])
def test_v3_bf16_close_to_f32(rng, monkeypatch, ymix_bf16):
    """Both the packed-bf16 y-mix (default) and the f32 fallback
    (POET_V3_YMIX_BF16=0) must track the f32 forward."""
    from poet_tpu.ops.deform_attn_pallas_v3 import ms_deform_attn_pallas_v3

    monkeypatch.setenv("POET_V3_YMIX_BF16", ymix_bf16)
    value, shapes, locs, w = _make_inputs(rng, B=1, Q=6, H=2, D=8)
    a = np.asarray(ms_deform_attn_pallas_v3(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
    b = np.asarray(ms_deform_attn_pallas_v3(
        jnp.asarray(value, jnp.bfloat16), shapes,
        jnp.asarray(locs), jnp.asarray(w)).astype(jnp.float32))
    np.testing.assert_allclose(a, b, atol=5e-2)


@pytest.mark.slow
def test_v3_wide_first_level(rng):
    """YOLOv4-pyramid-like geometry: a wide (Wl=80) stride-8 first level.

    The production yolo path (strides 8/16/32 + extra 64) runs the kernel at
    level widths up to 80 — wider than the rcnn pyramid's 40 — which changes
    the x-mix dot K dimension and the value pre-arrangement tiling. Verified
    exact on the real chip at full S=6380 (fwd 3e-7, grads <2e-6 rel); this
    keeps a scaled-down CPU guard in the suite.
    """
    from poet_tpu.ops.deform_attn_pallas_v3 import ms_deform_attn_pallas_v3

    value, shapes, locs, w = _make_inputs(
        rng, B=1, Q=8, H=2, D=8, shapes=((12, 80), (6, 40), (3, 20)))
    a = np.asarray(ms_deform_attn_xla(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
    b = np.asarray(ms_deform_attn_pallas_v3(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
    np.testing.assert_allclose(a, b, atol=2e-5)


@pytest.mark.parametrize("ymix_bf16", ["0", "1"])
def test_v3_fused_gradients_bf16_close_to_f32(rng, monkeypatch, ymix_bf16):
    """The packed-bf16 dg/y-mix path (bf16 inputs, default) AND its f32
    fallback (POET_V3_YMIX_BF16=0) must stay near the f32 autodiff
    reference: the one-hot row operators have 2 nonzero rows, so each
    product takes a single bf16 rounding (~0.4% rel)."""
    from poet_tpu.ops.deform_attn_pallas_v3 import ms_deform_attn_fused

    monkeypatch.setenv("POET_V3_YMIX_BF16", ymix_bf16)
    value, shapes, locs, w = _make_inputs(rng, B=1, Q=6, H=2, D=8)

    def loss_ref(v, l, a):
        return jnp.sum(jnp.sin(3.0 * ms_deform_attn_xla(v, shapes, l, a)))

    def loss_v3(v, l, a):
        return jnp.sum(jnp.sin(3.0 * ms_deform_attn_fused(
            v.astype(jnp.bfloat16), shapes, l, a).astype(jnp.float32)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
    gv = jax.grad(loss_v3, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
    for name, (a, b) in zip(["d_value", "d_loc", "d_attn"], zip(gr, gv)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1.0)
        assert np.isfinite(b).all(), name
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-2,
                                   err_msg=name)

