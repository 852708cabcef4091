"""End-to-end PoET model tests (tiny config, CPU)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

import jax
import jax.numpy as jnp

from poet_tpu.config import PoETConfig
from poet_tpu.models import build_model
from poet_tpu.models.matcher import match_poses
from poet_tpu.models import criterion as crit


def tiny_config(**model_overrides):
    cfg = PoETConfig()
    cfg.backbone.name = "maskrcnn"
    cfg.model.hidden_dim = 64
    cfg.model.nheads = 4
    cfg.model.enc_layers = 2
    cfg.model.dec_layers = 2
    cfg.model.dim_feedforward = 128
    cfg.model.num_queries = 5
    cfg.model.n_classes = 4
    cfg.model.dropout = 0.0
    for k, v in model_overrides.items():
        setattr(cfg.model, k, v)
    return cfg


def make_batch(rng, B=2, Q=5, H=128, W=128):
    images = rng.uniform(size=(B, H, W, 3)).astype(np.float32)
    pad_mask = np.zeros((B, H, W), dtype=bool)
    if B == 2:
        n_boxes = np.array([3, 5], dtype=np.int32)
    else:
        n_boxes = rng.integers(1, Q + 1, size=(B,)).astype(np.int32)
    boxes = rng.uniform(0.2, 0.7, size=(B, Q, 4)).astype(np.float32)
    boxes[..., 2:] = rng.uniform(0.05, 0.2, size=(B, Q, 2))
    labels = rng.integers(1, 5, size=(B, Q)).astype(np.int32)
    for b in range(B):
        boxes[b, n_boxes[b]:] = -1.0
        labels[b, n_boxes[b]:] = -1
    rots = ScipyRot.random(B * Q, random_state=3).as_matrix().reshape(B, Q, 3, 3)
    targets = {
        "boxes": jnp.asarray(boxes),
        "labels": jnp.asarray(labels),
        "n_boxes": jnp.asarray(n_boxes),
        "relative_position": jnp.asarray(rng.normal(size=(B, Q, 3)).astype(np.float32)),
        "relative_rotation": jnp.asarray(rots.astype(np.float32)),
    }
    return jnp.asarray(images), jnp.asarray(pad_mask), targets


@pytest.fixture(scope="module")
def model_and_outputs():
    rng = np.random.default_rng(1)
    cfg = tiny_config()
    model = build_model(cfg)
    images, pad_mask, targets = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)
    outputs = model.apply(params, images, pad_mask, targets)
    return cfg, model, params, images, pad_mask, targets, outputs


def test_output_shapes(model_and_outputs):
    cfg, model, params, images, pad_mask, targets, out = model_and_outputs
    L, Q = cfg.model.dec_layers, cfg.model.num_queries
    assert out["translations"].shape == (L, 2, Q, 3)
    assert out["rotations"].shape == (L, 2, Q, 3, 3)
    assert out["pred_boxes"].shape == (2, Q, 4)
    assert out["pred_classes"].shape == (2, Q)


def test_rotations_are_valid(model_and_outputs):
    _, _, _, _, _, _, out = model_and_outputs
    R = np.asarray(out["rotations"]).reshape(-1, 3, 3)
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (len(R), 1, 1)), atol=1e-4)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)


def test_dummy_conventions(model_and_outputs):
    """Dummy slots keep the reference conventions: boxes -1, class -1."""
    _, _, _, _, _, targets, out = model_and_outputs
    n = np.asarray(targets["n_boxes"])
    boxes = np.asarray(out["pred_boxes"])
    classes = np.asarray(out["pred_classes"])
    for b in range(2):
        np.testing.assert_allclose(boxes[b, n[b]:], -1.0)
        np.testing.assert_array_equal(classes[b, n[b]:], -1)


def test_loss_and_gradients(model_and_outputs):
    cfg, model, params, images, pad_mask, targets, _ = model_and_outputs

    def loss_fn(p):
        out = model.apply(p, images, pad_mask, targets)
        match = match_poses(
            out["pred_boxes"], out["pred_classes"], targets["boxes"],
            targets["labels"], out["n_boxes"], targets["n_boxes"], bbox_mode="gt",
        )
        losses = crit.compute_losses(out, targets, match)
        return crit.weighted_total(losses), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    assert set(losses) == {"loss_trans", "loss_rot", "loss_trans_0", "loss_rot_0"}

    flat = jax.tree_util.tree_leaves_with_path(grads)
    backbone_nonzero = transformer_nonzero = 0.0
    for path, g in flat:
        name = jax.tree_util.keystr(path)
        mag = float(jnp.abs(g).max())
        assert np.isfinite(mag), name
        if "backbone" in name:
            backbone_nonzero = max(backbone_nonzero, mag)
        elif "transformer" in name:
            transformer_nonzero = max(transformer_nonzero, mag)
    # frozen feature extractor: stop_gradient kills every backbone grad
    assert backbone_nonzero == 0.0
    assert transformer_nonzero > 0.0


def test_gt_vs_jitter_mode(rng):
    cfg = tiny_config(bbox_mode="jitter")
    model = build_model(cfg)
    images, pad_mask, targets = make_batch(rng)
    targets["jitter_boxes"] = targets["boxes"] + 0.01
    params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)
    out = model.apply(params, images, pad_mask, targets)
    # pred boxes must be the jitter boxes on valid slots
    n = np.asarray(targets["n_boxes"])
    for b in range(2):
        np.testing.assert_allclose(
            np.asarray(out["pred_boxes"])[b, : n[b]],
            np.asarray(targets["jitter_boxes"])[b, : n[b]],
            atol=1e-6,
        )


def test_class_agnostic_mode(rng):
    cfg = tiny_config(class_mode="agnostic")
    model = build_model(cfg)
    images, pad_mask, targets = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)
    out = model.apply(params, images, pad_mask, targets)
    assert out["translations"].shape[-1] == 3


def test_aleatoric_heads(rng):
    cfg = tiny_config(aleatoric=True)
    model = build_model(cfg)
    images, pad_mask, targets = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)
    out = model.apply(params, images, pad_mask, targets)
    assert out["translations_aleatoric"].shape == (2, 2, 5, 3)
    assert out["rotations_aleatoric"].shape == (2, 2, 5, 3)
    match = match_poses(
        out["pred_boxes"], out["pred_classes"], targets["boxes"],
        targets["labels"], out["n_boxes"], targets["n_boxes"], bbox_mode="gt",
    )
    losses = crit.compute_losses(out, targets, match, aleatoric=True)
    assert np.isfinite(float(crit.weighted_total(losses)))


def test_quaternion_mode(rng):
    cfg = tiny_config(rotation_representation="quat")
    model = build_model(cfg)
    images, pad_mask, targets = make_batch(rng)
    from poet_tpu.utils.quaternions import rot2quat

    targets["relative_quaternions"] = rot2quat(targets["relative_rotation"])
    params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)
    out = model.apply(params, images, pad_mask, targets)
    assert out["rotations"].shape == (2, 2, 5, 4)
    norms = np.linalg.norm(np.asarray(out["rotations"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    match = match_poses(
        out["pred_boxes"], out["pred_classes"], targets["boxes"],
        targets["labels"], out["n_boxes"], targets["n_boxes"], bbox_mode="gt",
    )
    losses = crit.compute_losses(out, targets, match, rotation_mode="quat")
    assert np.isfinite(float(crit.weighted_total(losses)))


def test_bfloat16_compute_matches_f32(rng):
    """bf16 is the production inference dtype (bench.py); params stay f32 so
    the same param tree drives both models. Outputs must stay within bf16
    round-off of the f32 path: heads/losses run on f32-cast decoder states."""
    cfg = tiny_config()
    m32 = build_model(cfg)
    images, pad_mask, targets = make_batch(rng)
    params = m32.init(jax.random.PRNGKey(0), images, pad_mask, targets)
    out32 = m32.apply(params, images, pad_mask, targets)

    cfg.model.dtype = "bfloat16"
    m16 = build_model(cfg)
    out16 = m16.apply(params, images, pad_mask, targets)

    t32, t16 = np.asarray(out32["translations"]), np.asarray(out16["translations"])
    r32, r16 = np.asarray(out32["rotations"]), np.asarray(out16["rotations"])
    assert t16.dtype == np.float32 and r16.dtype == np.float32
    assert np.abs(t32 - t16).max() < 0.05
    # geodesic angle between the two predicted rotations, in degrees
    tr = np.einsum("...ij,...ij->...", r32, r16)
    ang = np.degrees(np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0)))
    assert ang.max() < 5.0


def test_bf16_params_at_rest_bit_identical(rng):
    """cast_params_for_inference must be a pure perf transform: the bf16
    model's outputs are BIT-identical with cast vs f32-at-rest params (flax
    would cast the same leaves to the same bf16 values in-program), f32-compute
    islands (heads, sampling_offsets, ...) keep f32 leaves, and the f32 config
    is a no-op."""
    from flax import traverse_util

    from poet_tpu.utils.params import cast_params_for_inference

    cfg = tiny_config()
    cfg.model.dtype = "bfloat16"
    model = build_model(cfg)
    images, pad_mask, targets = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)
    cast = cast_params_for_inference(params)

    flat = traverse_util.flatten_dict(cast)
    # bf16-compute kernels went bf16; f32 islands stayed f32
    assert flat[next(k for k in flat if "encoder_layer_0" in k and
                     "value_proj" in k and k[-1] == "kernel")].dtype == jnp.bfloat16
    assert flat[next(k for k in flat if "fpn_body" in k and
                     k[-1] == "kernel")].dtype == jnp.bfloat16
    for k, v in flat.items():
        if any(p in ("sampling_offsets", "attention_weights") or
               p.startswith(("translation_head", "rotation_head")) for p in k):
            assert v.dtype == jnp.float32, k
        if v.ndim < 2:
            assert v.dtype == jnp.float32, k

    out_f32_rest = model.apply(params, images, pad_mask, targets)
    out_b16_rest = model.apply(cast, images, pad_mask, targets)
    for key in ("translations", "rotations"):
        np.testing.assert_array_equal(np.asarray(out_f32_rest[key]),
                                      np.asarray(out_b16_rest[key]))

    cfg32 = tiny_config()
    p32 = build_model(cfg32).init(jax.random.PRNGKey(0), images, pad_mask, targets)
    assert cast_params_for_inference(p32, jnp.float32) is p32


@pytest.mark.slow
def test_fused_enc_impl_reaches_the_graph_and_matches_sep(rng):
    """Regression: cfg.model.enc_deform_impl (NOT a root-config attr) must
    select the encoder sampling core — a root-level setattr silently built
    the default path. Also checks model-level numerical parity of the fused
    Pallas kernel vs sep."""
    from jax.experimental.pallas import tpu as pltpu

    images, pad_mask, targets = make_batch(np.random.default_rng(5))
    cfg = tiny_config()
    cfg.model.enc_deform_impl = "fused"
    model_f = build_model(cfg)

    jaxpr = str(jax.make_jaxpr(
        lambda p, i, m, t: model_f.apply(p, i, m, t, deterministic=True))(
        jax.eval_shape(model_f.init, jax.random.PRNGKey(0), images, pad_mask,
                       targets), images, pad_mask, targets))
    assert "pallas_call" in jaxpr

    cfg_s = tiny_config()
    cfg_s.model.enc_deform_impl = "sep"
    model_s = build_model(cfg_s)
    params = model_s.init(jax.random.PRNGKey(0), images, pad_mask, targets)
    out_s = model_s.apply(params, images, pad_mask, targets,
                          deterministic=True)
    with pltpu.force_tpu_interpret_mode():
        out_f = model_f.apply(params, images, pad_mask, targets,
                              deterministic=True)
    np.testing.assert_allclose(np.asarray(out_f["translations"]),
                               np.asarray(out_s["translations"]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_f["rotations"]),
                               np.asarray(out_s["rotations"]),
                               atol=1e-4, rtol=1e-4)


def test_enc_remat_config_logic():
    from poet_tpu.config import PoETConfig

    cfg = PoETConfig()
    cfg.model.enc_deform_impl = "sep"
    assert cfg.model.enc_remat_enabled()            # auto -> on for XLA cores
    cfg.model.enc_deform_impl = "fused"
    assert not cfg.model.enc_remat_enabled()        # auto -> off for custom VJP
    cfg.model.enc_remat = "on"
    assert cfg.model.enc_remat_enabled()
    cfg.model.enc_remat = "off"
    cfg.model.enc_deform_impl = "sep"
    assert not cfg.model.enc_remat_enabled()


def test_enc_deform_impl_auto_resolution(monkeypatch):
    """Default 'auto' resolves by backend: fused on TPU, sep elsewhere.

    The CPU suite exercises the real jax path (cpu backend -> 'sep'); the
    TPU branch is pinned by monkeypatching the backend probe."""
    import poet_tpu.config as config_mod
    from poet_tpu.config import PoETConfig

    cfg = PoETConfig()
    assert cfg.model.enc_deform_impl == "auto"
    assert cfg.model.resolved_enc_deform_impl() == "sep"  # cpu backend
    assert cfg.model.enc_remat_enabled()

    monkeypatch.setattr(config_mod, "_default_backend_is_tpu", lambda: True)
    assert cfg.model.resolved_enc_deform_impl() == "fused"
    assert not cfg.model.enc_remat_enabled()    # custom VJP -> no remat

    cfg.model.enc_deform_impl = "mxu"           # explicit choice wins
    assert cfg.model.resolved_enc_deform_impl() == "mxu"


def test_dec_deform_impl_resolution():
    """Decoder cross-attn 'auto' resolves by memory length at trace time:
    'mxu' below DEC_FUSED_MIN_S (won the on-chip A/B vs 'fused' at S=1600:
    27.59 vs 28.71 ms/batch on the bs=16 flagship), 'fused' at/above it on
    a TPU backend only (this test runs on CPU, so large S stays 'mxu')."""
    from poet_tpu.config import PoETConfig
    from poet_tpu.models.transformer import DEC_FUSED_MIN_S, resolve_dec_impl

    cfg = PoETConfig()
    assert cfg.model.dec_deform_impl == "auto"
    assert cfg.model.resolved_dec_deform_impl() == "auto"   # deferred

    assert resolve_dec_impl("auto", 1600) == "mxu"          # rcnn pyramid
    # measured verdicts (see DEC_FUSED_MIN_S / DEC_GATHER_MIN_S): mxu
    # everywhere; fused and gather never win as the decoder core
    assert DEC_FUSED_MIN_S is None
    assert resolve_dec_impl("auto", 6380) == "mxu"          # YOLO pyramid
    import poet_tpu.models.transformer as tr

    orig = tr.DEC_FUSED_MIN_S
    tr.DEC_FUSED_MIN_S = 4000                               # tunable works
    import poet_tpu.config as config_mod

    orig_tpu = config_mod._default_backend_is_tpu
    config_mod._default_backend_is_tpu = lambda: True
    try:
        assert resolve_dec_impl("auto", 6380) == "fused"
        assert resolve_dec_impl("auto", 1600) == "mxu"
    finally:
        tr.DEC_FUSED_MIN_S = orig
        config_mod._default_backend_is_tpu = orig_tpu

    cfg.model.dec_deform_impl = "fused"         # explicit choice wins
    assert cfg.model.resolved_dec_deform_impl() == "fused"
    assert resolve_dec_impl("fused", 100) == "fused"


def test_enc_remat_gradients_match():
    """Remat must not change gradients — only backward-pass scheduling."""
    rng = np.random.default_rng(7)
    images, pad, targets = make_batch(rng, B=1, Q=5, H=64, W=64)

    def grads(enc_remat):
        cfg = tiny_config()
        cfg.model.enc_remat = enc_remat
        model = build_model(cfg)
        params = model.init(jax.random.PRNGKey(0), images, pad, targets)

        def loss(p):
            out = model.apply(p, images, pad, targets, deterministic=True)
            return (jnp.mean(out["translations"] ** 2)
                    + jnp.mean(out["rotations"] ** 2))

        return jax.grad(loss)(params)

    ga = grads("on")
    gb = grads("off")
    for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def _randomize_offset_kernels(params, seed=0):
    """Give the zero-initialized deformable sampling_offsets /
    attention_weights kernels random values. At init those are exactly zero
    (Deformable-DETR convention), which makes encoder outputs INDEPENDENT of
    the image position embeddings — q = src + pos feeds only those two
    projections. Position-embedding wiring is only observable past them."""
    key = [jax.random.PRNGKey(seed)]

    def walk(tree, path=""):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v, path + "/" + k)
            elif k == "kernel" and (
                "sampling_offsets" in path or "attention_weights" in path
            ):
                key[0], sub = jax.random.split(key[0])
                out[k] = 0.1 * jax.random.normal(sub, v.shape, v.dtype)
            else:
                out[k] = v
        return out

    return {"params": walk(params["params"])}


def test_position_embedding_learned_is_wired(rng):
    """--position_embedding learned must change the model (VERDICT r2 #3):
    the learned tables exist in the param tree, feed every pyramid level
    (incl. the extra stride-64 level), and perturbing them moves outputs."""
    np_rng = np.random.default_rng(11)
    images, pad, targets = make_batch(np_rng, B=1, Q=5, H=128, W=128)
    cfg = tiny_config()
    cfg.backbone.position_embedding = "learned"
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), images, pad, targets)
    params = _randomize_offset_kernels(params)

    pe = params["params"]["position_embedding"]
    assert pe["row_embed"].shape == (50, 32)       # hidden_dim // 2
    assert pe["col_embed"].shape == (50, 32)

    out0 = model.apply(params, images, pad, targets, deterministic=True)
    params2 = jax.tree_util.tree_map(lambda x: x, params)
    params2["params"] = dict(params2["params"])
    params2["params"]["position_embedding"] = {
        "row_embed": pe["row_embed"] + 1.0,
        "col_embed": pe["col_embed"],
    }
    out1 = model.apply(params2, images, pad, targets, deterministic=True)
    assert not np.allclose(
        np.asarray(out0["translations"]), np.asarray(out1["translations"])
    ), "learned position tables do not reach the transformer"


def test_position_embedding_scale_is_wired(rng):
    """--position_embedding_scale must change sine-embedding outputs. (The
    reference accepts the flag, main.py:69, but never plumbs it — here it is
    real; the default 2*pi reproduces reference outputs.)"""
    np_rng = np.random.default_rng(12)
    images, pad, targets = make_batch(np_rng, B=1, Q=5, H=128, W=128)
    cfg = tiny_config()
    model_a = build_model(cfg)
    params = model_a.init(jax.random.PRNGKey(0), images, pad, targets)
    params = _randomize_offset_kernels(params)
    cfg_b = tiny_config()
    cfg_b.backbone.position_embedding_scale = 1.0
    model_b = build_model(cfg_b)
    # sine embedding is parameter-free: the same param tree drives both
    out_a = model_a.apply(params, images, pad, targets, deterministic=True)
    out_b = model_b.apply(params, images, pad, targets, deterministic=True)
    assert not np.allclose(
        np.asarray(out_a["translations"]), np.asarray(out_b["translations"])
    ), "position_embedding_scale does not reach the sine embedding"
