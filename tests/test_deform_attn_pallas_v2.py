"""Separable Pallas kernel (v2) vs the XLA reference (interpret mode)."""

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


def test_v2_matches_xla(rng):
    from poet_tpu.ops.deform_attn_pallas_v2 import ms_deform_attn_pallas_v2

    value, shapes, locs, w = _make_inputs(rng, B=2, Q=6, H=4, D=8)
    a = np.asarray(ms_deform_attn_xla(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
    b = np.asarray(ms_deform_attn_pallas_v2(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_v2_multi_tile(rng):
    from poet_tpu.ops.deform_attn_pallas_v2 import ms_deform_attn_pallas_v2

    value, shapes, locs, w = _make_inputs(rng, B=1, Q=300, H=2, D=8)
    a = np.asarray(ms_deform_attn_xla(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
    b = np.asarray(ms_deform_attn_pallas_v2(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
    np.testing.assert_allclose(a, b, atol=2e-5)
