"""Host-side Mosaic lowering regression for the fused v3 kernel.

Runs OUTSIDE interpret mode (its own module: the v3 test file's autouse
interpret fixture would bypass Mosaic): `lower(lowering_platforms=("tpu",))`
verifies the Pallas->Mosaic MLIR on any host, no device needed.
"""

import pytest

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("dtype,ymix", [
    (jnp.float32, "1"),
    (jnp.bfloat16, "1"),   # packed-bf16 y-mix/dg (default)
    (jnp.bfloat16, "0"),   # f32 y-mix fallback
])
def test_v3_mosaic_lowering_both_dtypes(dtype, ymix, monkeypatch):
    """Host-side Mosaic lowering of fwd + fused adjoint for the tpu platform
    — catches vreg/verifier errors (e.g. 'matmul acc must be 32-bit' from a
    bf16 preferred_element_type) without any device. Runs OUTSIDE interpret
    mode on purpose. Covers both the packed-bf16 and f32 y-mix variants."""
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    from poet_tpu.ops.deform_attn_pallas_v3 import ms_deform_attn_fused

    monkeypatch.setenv("POET_V3_YMIX_BF16", ymix)

    shapes = ((8, 10), (4, 5))
    S = sum(h * w for h, w in shapes)
    B, H, D, L, P = 2, 2, 16, 2, 4
    v = jax.ShapeDtypeStruct((B, S, H, D), dtype)
    l = jax.ShapeDtypeStruct((B, S, H, L, P, 2), jnp.float32)
    a = jax.ShapeDtypeStruct((B, S, H, L, P), jnp.float32)

    def loss(v, l, a):
        o = ms_deform_attn_fused(v, shapes, l, a)
        return jnp.sum(o.astype(jnp.float32)), o

    g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2), has_aux=True))
    txt = g.trace(v, l, a).lower(lowering_platforms=("tpu",)).as_text()
    assert txt.count("tpu_custom_call") == 2  # fwd kernel + fused adjoint


@pytest.mark.parametrize("shapes", [
    # Mask R-CNN pyramid (strides 16/32/64 + extra 128, 640x480)
    ((30, 40), (15, 20), (8, 10), (4, 5)),
    # YOLOv4-CSP pyramid (strides 8/16/32 + extra 64) — S = 6380
    ((60, 80), (30, 40), (15, 20), (8, 10)),
])
def test_v3_mosaic_lowering_production_shapes(shapes):
    """Lower fwd + fused adjoint at the two PRODUCTION pyramids with the
    paper config (B=16, H=16, D=16, L=4, P=4, bf16 value). The head-group
    VMEM sizing (_pick_head_group) is shape-dependent, so tiny-shape
    lowering alone would not exercise the grouping actually used on chip."""
    from poet_tpu.ops.deform_attn_pallas_v3 import ms_deform_attn_fused

    S = sum(h * w for h, w in shapes)
    B, H, D, L, P = 16, 16, 16, 4, 4
    v = jax.ShapeDtypeStruct((B, S, H, D), jnp.bfloat16)
    l = jax.ShapeDtypeStruct((B, S, H, L, P, 2), jnp.float32)
    a = jax.ShapeDtypeStruct((B, S, H, L, P), jnp.float32)

    def loss(v, l, a):
        o = ms_deform_attn_fused(v, shapes, l, a)
        return jnp.sum(o.astype(jnp.float32)), o

    g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2), has_aux=True))
    txt = g.trace(v, l, a).lower(lowering_platforms=("tpu",)).as_text()
    assert txt.count("tpu_custom_call") == 2


def test_nn_pallas_mosaic_lowering():
    """Same device-free Mosaic check for the ADD-S min-distance kernel
    (caught: output block shape violating the (8, 128) tiling rule)."""
    from poet_tpu.ops.nn_pallas import min_dist_sq_pallas

    gt = jax.ShapeDtypeStruct((4, 2600, 3), jnp.float32)
    est = jax.ShapeDtypeStruct((4, 2600, 3), jnp.float32)
    f = jax.jit(min_dist_sq_pallas)
    txt = f.trace(gt, est).lower(lowering_platforms=("tpu",)).as_text()
    assert txt.count("tpu_custom_call") == 1
