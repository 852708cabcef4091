"""Host-side Mosaic lowering regression for the fused v3 kernel.

Runs OUTSIDE interpret mode (its own module: the v3 test file's autouse
interpret fixture would bypass Mosaic): `lower(lowering_platforms=("tpu",))`
verifies the Pallas->Mosaic MLIR on any host, no device needed.
"""

import pytest

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("dtype,ymix,merged", [
    (jnp.float32, "1", "0"),   # two-kernel adjoint (default)
    (jnp.bfloat16, "1", "0"),  # packed-bf16 y-mix/dg
    (jnp.bfloat16, "0", "0"),  # f32 y-mix fallback
    (jnp.float32, "1", "1"),   # merged single-kernel adjoint
    (jnp.bfloat16, "1", "1"),
])
def test_v3_mosaic_lowering_both_dtypes(dtype, ymix, merged, monkeypatch):
    """Host-side Mosaic lowering of fwd + adjoint for the tpu platform
    — catches vreg/verifier errors (e.g. 'matmul acc must be 32-bit' from a
    bf16 preferred_element_type) without any device. Runs OUTSIDE interpret
    mode on purpose. Covers the packed-bf16 and f32 y-mix variants and both
    adjoint layouts (merged single kernel vs d_value|d_loc two-kernel)."""
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    from poet_tpu.ops.deform_attn_pallas_v3 import ms_deform_attn_fused

    monkeypatch.setenv("POET_V3_YMIX_BF16", ymix)
    monkeypatch.setenv("POET_V3_MERGED_ADJOINT", merged)

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
    # fwd kernel + adjoint: merged = 1 kernel, two-kernel = 2 (dval, dloc)
    expected = 2 if merged == "1" else 3
    assert txt.count("tpu_custom_call") == expected


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
    # default two-kernel adjoint: fwd + dval + dloc
    assert txt.count("tpu_custom_call") == 3


def test_nn_pallas_mosaic_lowering():
    """Same device-free Mosaic check for the ADD-S min-distance kernel
    (caught: output block shape violating the (8, 128) tiling rule)."""
    from poet_tpu.ops.nn_pallas import min_dist_sq_pallas

    gt = jax.ShapeDtypeStruct((4, 2600, 3), jnp.float32)
    est = jax.ShapeDtypeStruct((4, 2600, 3), jnp.float32)
    f = jax.jit(min_dist_sq_pallas)
    txt = f.trace(gt, est).lower(lowering_platforms=("tpu",)).as_text()
    assert txt.count("tpu_custom_call") == 1
