"""Deformable-attention core vs torch.grid_sample ground truth.

This mirrors how Deformable-DETR validates its CUDA op: compare against the
pure-PyTorch grid_sample formulation (bilinear, zero padding,
align_corners=False). torch here is an independent oracle, CPU-only.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from poet_tpu.ops.deform_attn import ms_deform_attn_xla


def torch_ms_deform_attn(value, spatial_shapes, sampling_locations, attention_weights):
    """Ground-truth via torch grid_sample (independent oracle)."""
    N, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    value_list = value.split([h * w for h, w in spatial_shapes], dim=1)
    sampling_grids = 2 * sampling_locations - 1
    out = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value_list[lvl].flatten(2).transpose(1, 2).reshape(N * H, D, h, w)
        grid = sampling_grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)  # (N*H, Q, P, 2)
        sampled = F.grid_sample(v, grid, mode="bilinear", padding_mode="zeros", align_corners=False)
        out.append(sampled)  # (N*H, D, Q, P)
    attn = attention_weights.transpose(1, 2).reshape(N * H, 1, Q, L * P)
    output = (torch.stack(out, dim=-2).flatten(-2) * attn).sum(-1)
    return output.view(N, H * D, Q).transpose(1, 2).contiguous()


def _make_inputs(rng, B=2, Q=6, H=4, D=8, shapes=((6, 9), (4, 5), (2, 3))):
    L = len(shapes)
    P = 4
    S = sum(h * w for h, w in shapes)
    value = rng.normal(size=(B, S, H, D)).astype(np.float32)
    # locations spread inside [0,1] with some outside to exercise zero-padding
    locs = rng.uniform(-0.2, 1.2, size=(B, Q, H, L, P, 2)).astype(np.float32)
    w = rng.uniform(size=(B, Q, H, L * P)).astype(np.float32)
    w = w / w.sum(-1, keepdims=True)
    w = w.reshape(B, Q, H, L, P)
    return value, shapes, locs, w


def test_matches_grid_sample(rng):
    value, shapes, locs, w = _make_inputs(rng)
    ours = np.asarray(ms_deform_attn_xla(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
    ref = torch_ms_deform_attn(
        torch.from_numpy(value), shapes, torch.from_numpy(locs), torch.from_numpy(w)
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_matches_grid_sample_single_level(rng):
    value, shapes, locs, w = _make_inputs(rng, shapes=((8, 8),))
    ours = np.asarray(ms_deform_attn_xla(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
    ref = torch_ms_deform_attn(
        torch.from_numpy(value), shapes, torch.from_numpy(locs), torch.from_numpy(w)
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_gradients_match_torch(rng):
    value, shapes, locs, w = _make_inputs(rng, B=1, Q=3, H=2, D=4, shapes=((5, 7), (3, 4)))

    def loss_jax(v, l, aw):
        return jnp.sum(ms_deform_attn_xla(v, shapes, l, aw) ** 2)

    gv, gl, gw = jax.grad(loss_jax, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w)
    )

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(locs).requires_grad_(True)
    tw = torch.from_numpy(w).requires_grad_(True)
    loss = (torch_ms_deform_attn(tv, shapes, tl, tw) ** 2).sum()
    loss.backward()

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), tw.grad.numpy(), atol=1e-4)
    # location grads can disagree exactly at bilinear cell borders; tolerance
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), atol=1e-3)


def test_jit_compiles(rng):
    value, shapes, locs, w = _make_inputs(rng)
    fn = jax.jit(lambda v, l, aw: ms_deform_attn_xla(v, shapes, l, aw))
    out = fn(jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
    assert out.shape == (2, 6, 4 * 8)


class TestMXUFormulation:
    """ms_deform_attn_mxu must match the gather/grid_sample semantics exactly."""

    def test_matches_xla(self, rng):
        from poet_tpu.ops.deform_attn import ms_deform_attn_mxu

        value, shapes, locs, w = _make_inputs(rng)
        a = np.asarray(ms_deform_attn_xla(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
        b = np.asarray(ms_deform_attn_mxu(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
        np.testing.assert_allclose(a, b, atol=2e-5)

    def test_matches_xla_chunked(self, rng):
        """Q larger than chunk size exercises the lax.map path + Q padding."""
        from poet_tpu.ops.deform_attn import ms_deform_attn_mxu

        value, shapes, locs, w = _make_inputs(rng, Q=37)
        a = np.asarray(ms_deform_attn_xla(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
        b = np.asarray(ms_deform_attn_mxu(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w), q_chunk=16))
        np.testing.assert_allclose(a, b, atol=2e-5)

    def test_gradients_match(self, rng):
        from poet_tpu.ops.deform_attn import ms_deform_attn_mxu

        value, shapes, locs, w = _make_inputs(rng, B=1, Q=5, H=2, D=4, shapes=((5, 7), (3, 4)))

        def loss_a(v, l, aw):
            return jnp.sum(ms_deform_attn_xla(v, shapes, l, aw) ** 2)

        def loss_b(v, l, aw):
            return jnp.sum(ms_deform_attn_mxu(v, shapes, l, aw, q_chunk=4) ** 2)

        ga = jax.grad(loss_a, argnums=(0, 1, 2))(jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
        gb = jax.grad(loss_b, argnums=(0, 1, 2))(jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
        for a, b in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestPatchFormulation:
    """ms_deform_attn_patch (2x2-patch lax.gather) must match exactly too."""

    def test_matches_grid_sample(self, rng):
        from poet_tpu.ops.deform_attn import ms_deform_attn_patch

        value, shapes, locs, w = _make_inputs(rng)
        ours = np.asarray(ms_deform_attn_patch(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
        ref = torch_ms_deform_attn(
            torch.from_numpy(value), shapes, torch.from_numpy(locs), torch.from_numpy(w)
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_far_out_of_bounds(self, rng):
        """Locations far outside the map exercise the patch-clamp masking."""
        from poet_tpu.ops.deform_attn import ms_deform_attn_patch

        value, shapes, locs, w = _make_inputs(rng)
        locs = (locs - 0.5) * 8.0 + 0.5  # spread to roughly [-3.5, 4.5]
        a = np.asarray(ms_deform_attn_xla(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
        b = np.asarray(ms_deform_attn_patch(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
        np.testing.assert_allclose(a, b, atol=2e-5)

    def test_gradients_match(self, rng):
        from poet_tpu.ops.deform_attn import ms_deform_attn_patch

        value, shapes, locs, w = _make_inputs(rng, B=1, Q=5, H=2, D=4,
                                              shapes=((5, 7), (3, 4)))

        def loss_a(v, l, aw):
            return jnp.sum(ms_deform_attn_xla(v, shapes, l, aw) ** 2)

        def loss_b(v, l, aw):
            return jnp.sum(ms_deform_attn_patch(v, shapes, l, aw) ** 2)

        ga = jax.grad(loss_a, argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
        gb = jax.grad(loss_b, argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
        for a, b in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_jit_compiles(self, rng):
        from poet_tpu.ops.deform_attn import ms_deform_attn_patch

        value, shapes, locs, w = _make_inputs(rng)
        fn = jax.jit(lambda v, l, aw: ms_deform_attn_patch(v, shapes, l, aw))
        out = fn(jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
        assert out.shape == (2, 6, 4 * 8)


class TestSepFormulation:
    """ms_deform_attn_sep (separable one-hot matmuls) must match exactly."""

    def test_matches_grid_sample(self, rng):
        from poet_tpu.ops.deform_attn import ms_deform_attn_sep

        value, shapes, locs, w = _make_inputs(rng)
        ours = np.asarray(ms_deform_attn_sep(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
        ref = torch_ms_deform_attn(
            torch.from_numpy(value), shapes, torch.from_numpy(locs), torch.from_numpy(w)
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_far_out_of_bounds_chunked(self, rng):
        from poet_tpu.ops.deform_attn import ms_deform_attn_sep

        value, shapes, locs, w = _make_inputs(rng, Q=37)
        locs = (locs - 0.5) * 8.0 + 0.5
        a = np.asarray(ms_deform_attn_xla(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
        b = np.asarray(ms_deform_attn_sep(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w), q_chunk=16))
        np.testing.assert_allclose(a, b, atol=2e-5)

    def test_gradients_match(self, rng):
        from poet_tpu.ops.deform_attn import ms_deform_attn_sep

        value, shapes, locs, w = _make_inputs(rng, B=1, Q=5, H=2, D=4,
                                              shapes=((5, 7), (3, 4)))

        def loss_a(v, l, aw):
            return jnp.sum(ms_deform_attn_xla(v, shapes, l, aw) ** 2)

        def loss_b(v, l, aw):
            return jnp.sum(ms_deform_attn_sep(v, shapes, l, aw) ** 2)

        ga = jax.grad(loss_a, argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
        gb = jax.grad(loss_b, argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
        for a, b in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestSepCustomVJP:
    """ms_deform_attn_sep_cv: identical forward, hand-derived separable
    backward (ops/deform_attn.py:_sep_cv_bwd) — verified against autodiff of
    the XLA reference, including out-of-bounds locations and chunking."""

    def test_forward_identical(self, rng):
        from poet_tpu.ops.deform_attn import (ms_deform_attn_sep,
                                              ms_deform_attn_sep_cv)

        value, shapes, locs, w = _make_inputs(rng)
        a = np.asarray(ms_deform_attn_sep(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)))
        b = np.asarray(ms_deform_attn_sep_cv(
            jnp.asarray(value), tuple(shapes), jnp.asarray(locs), jnp.asarray(w)))
        np.testing.assert_array_equal(a, b)

    def test_gradients_match_xla_autodiff(self, rng):
        from poet_tpu.ops.deform_attn import ms_deform_attn_sep_cv

        value, shapes, locs, w = _make_inputs(rng, B=2, Q=9, H=2, D=4,
                                              shapes=((5, 7), (3, 4)))
        # include out-of-bounds samples: the masked one-hots must zero both
        # the value and the location gradients there
        locs = (locs - 0.5) * 2.5 + 0.5
        shapes = tuple(shapes)

        def loss_a(v, l, aw):
            return jnp.sum(jnp.sin(ms_deform_attn_xla(v, shapes, l, aw) * 0.7))

        def loss_b(v, l, aw):
            return jnp.sum(jnp.sin(ms_deform_attn_sep_cv(v, shapes, l, aw) * 0.7))

        ga = jax.grad(loss_a, argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
        gb = jax.grad(loss_b, argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
        for name, (a, b) in zip(("d_value", "d_loc", "d_attn"), zip(ga, gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, err_msg=name)

    def test_gradients_chunked(self, rng):
        """q_chunk smaller than Q exercises the lax.map backward path."""
        from poet_tpu.ops.deform_attn import (ms_deform_attn_sep,
                                              ms_deform_attn_sep_cv)

        value, shapes, locs, w = _make_inputs(rng, Q=37)
        shapes = tuple(shapes)

        def loss_a(v, l, aw):
            return jnp.sum(ms_deform_attn_sep(v, shapes, l, aw) ** 2)

        def loss_b(v, l, aw):
            return jnp.sum(ms_deform_attn_sep_cv(v, shapes, l, aw, 16) ** 2)

        ga = jax.grad(loss_a, argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
        gb = jax.grad(loss_b, argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
        for name, (a, b) in zip(("d_value", "d_loc", "d_attn"), zip(ga, gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, err_msg=name)

    def test_bf16_forward(self, rng):
        from poet_tpu.ops.deform_attn import (ms_deform_attn_sep,
                                              ms_deform_attn_sep_cv)

        value, shapes, locs, w = _make_inputs(rng)
        v16 = jnp.asarray(value, jnp.bfloat16)
        l16 = jnp.asarray(locs, jnp.bfloat16)
        w16 = jnp.asarray(w, jnp.bfloat16)
        a = np.asarray(ms_deform_attn_sep(v16, shapes, l16, w16), np.float32)
        b = np.asarray(ms_deform_attn_sep_cv(v16, tuple(shapes), l16, w16),
                       np.float32)
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("shapes,P,Q", [
    (((1, 1),), 1, 3),              # single 1x1 level, one point
    (((1, 9),), 4, 5),              # single-row level (Hl = 1)
    (((7, 1),), 4, 5),              # single-column level (Wl = 1)
    (((6, 9), (1, 1)), 2, 4),       # mixed sizes incl. degenerate level
    (((2, 3),), 1, 1),              # single query
])
def test_edge_shapes_all_formulations(rng, shapes, P, Q):
    """Degenerate level geometries through every production formulation:
    1-pixel / single-row / single-column maps exercise the one-hot bounds
    masks exactly where off-by-one padding bugs live. All must match the
    grid-sample reference, forward AND gradient."""
    from poet_tpu.ops.deform_attn import (ms_deform_attn_mxu,
                                          ms_deform_attn_sep,
                                          ms_deform_attn_sep_cv)

    B, H, D = 2, 2, 4
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    locs = jnp.asarray(rng.uniform(-0.3, 1.3, size=(B, Q, H, L, P, 2)),
                       jnp.float32)
    w = rng.uniform(size=(B, Q, H, L * P)).astype(np.float32)
    w = (w / w.sum(-1, keepdims=True)).reshape(B, Q, H, L, P)
    w = jnp.asarray(w)

    ref = np.asarray(ms_deform_attn_xla(value, shapes, locs, w))
    for name, op in (("mxu", ms_deform_attn_mxu),
                     ("sep", ms_deform_attn_sep),
                     ("sep_cv", lambda v, s, l, a:
                      ms_deform_attn_sep_cv(v, tuple(s), l, a))):
        got = np.asarray(op(value, shapes, locs, w))
        np.testing.assert_allclose(got, ref, atol=2e-5, err_msg=name)

    # gradients at degenerate geometry (sep + sep_cv vs xla autodiff)
    def loss(f):
        return lambda v, l, a: jnp.sum(f(v, l, a) ** 2)

    ga = jax.grad(loss(lambda v, l, a: ms_deform_attn_xla(v, shapes, l, a)),
                  argnums=(0, 1, 2))(value, locs, w)
    for name, f in (("sep", lambda v, l, a: ms_deform_attn_sep(v, shapes, l, a)),
                    ("sep_cv", lambda v, l, a:
                     ms_deform_attn_sep_cv(v, tuple(shapes), l, a))):
        gb = jax.grad(loss(f), argnums=(0, 1, 2))(value, locs, w)
        for part, (a, b) in zip(("d_value", "d_loc", "d_attn"), zip(ga, gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, err_msg=f"{name}:{part}")
