"""Pallas deformable-attention kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from poet_tpu.ops.deform_attn import ms_deform_attn_xla
from tests.test_deform_attn import _make_inputs


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Run all Pallas kernels interpreted (no TPU in CI)."""
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def test_forward_matches_xla(rng):
    from poet_tpu.ops.deform_attn_pallas import ms_deform_attn_pallas

    value, shapes, locs, w = _make_inputs(rng, B=2, Q=6, H=4, D=8)
    a = np.asarray(ms_deform_attn_xla(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
    b = np.asarray(
        ms_deform_attn_pallas(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w), 128)
    )
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_forward_multiple_tiles(rng):
    from poet_tpu.ops.deform_attn_pallas import ms_deform_attn_pallas

    value, shapes, locs, w = _make_inputs(rng, B=1, Q=300, H=2, D=8)
    a = np.asarray(ms_deform_attn_xla(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
    b = np.asarray(
        ms_deform_attn_pallas(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w), 128)
    )
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_gradients_match_xla(rng):
    from poet_tpu.ops.deform_attn_pallas import ms_deform_attn_pallas

    value, shapes, locs, w = _make_inputs(rng, B=1, Q=5, H=2, D=4, shapes=((5, 7), (3, 4)))

    def loss_ref(v, l, aw):
        return jnp.sum(ms_deform_attn_xla(v, shapes, l, aw) ** 2)

    def loss_pl(v, l, aw):
        return jnp.sum(ms_deform_attn_pallas(v, shapes, l, aw, 128) ** 2)

    ga = jax.grad(loss_ref, argnums=(0, 1, 2))(jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
    gb = jax.grad(loss_pl, argnums=(0, 1, 2))(jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
    for name, a, b in zip(("d_value", "d_loc", "d_attn"), ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, err_msg=name)


def test_gradients_match_multi_tile(rng):
    from poet_tpu.ops.deform_attn_pallas import ms_deform_attn_pallas

    value, shapes, locs, w = _make_inputs(rng, B=2, Q=200, H=2, D=8)

    def loss_ref(v, l, aw):
        return jnp.sum(jnp.sin(ms_deform_attn_xla(v, shapes, l, aw)))

    def loss_pl(v, l, aw):
        return jnp.sum(jnp.sin(ms_deform_attn_pallas(v, shapes, l, aw, 128)))

    ga = jax.grad(loss_ref, argnums=(0, 1, 2))(jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
    gb = jax.grad(loss_pl, argnums=(0, 1, 2))(jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
    for name, a, b in zip(("d_value", "d_loc", "d_attn"), ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, err_msg=name)
