"""Paper-geometry AOT compile on the 8-device dp x sp x tp mesh (VERDICT r4 #5).

The shrunken dryrun proves wiring, not geometry: head-group sizing at H=16,
Q-tile padding at S=1600 (rcnn pyramid) and S=6380 (YOLO full pyramid) under
'seq' sharding are never exercised by the 2+2-layer hidden-64 runs. These
tests AOT-lower + COMPILE the PAPER config (5 enc / 5 dec / 16 heads /
hidden 256, 480x640, reference README.md:61 + main.py:86-101) on the virtual
mesh, using abstract operands (jax.eval_shape / ShapeDtypeStruct) so no
480x640 CPU forward actually runs — a geometry-dependent partitioning bug
(wrong block row-slice at H=16, uneven Q_pad shard, bad custom_partitioning
rule) surfaces at compile time. The Pallas inner impls are swapped for XLA
twins exactly as in test_deform_attn_fused_sharded.py (interpret-mode pallas
lowers to io_callbacks the SPMD partitioner rejects); the partitioning rules,
projections, padding, and result assembly under test are the real ones.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from poet_tpu.ops import deform_attn_pallas_v3 as v3
from tests.test_deform_attn_fused_sharded import _t_xla_fwd, _t_xla_bwd, _xla_fwd, _xla_bwd


@pytest.fixture(autouse=True)
def _xla_inner(monkeypatch):
    monkeypatch.setattr(v3, "ms_deform_attn_pallas_v3", _xla_fwd)
    monkeypatch.setattr(v3, "_v3_bwd_impl", _xla_bwd)
    monkeypatch.setattr(v3, "_v3_t_impl", _t_xla_fwd)
    monkeypatch.setattr(v3, "_v3_t_bwd_impl", _t_xla_bwd)
    for c in (v3._sharded_fwd, v3._sharded_bwd,
              v3._sharded_fwd_t, v3._sharded_bwd_t):
        c.cache_clear()
    yield
    for c in (v3._sharded_fwd, v3._sharded_bwd,
              v3._sharded_fwd_t, v3._sharded_bwd_t):
        c.cache_clear()


def _mesh_222():
    from poet_tpu.parallel.tp import create_mesh_3d

    return create_mesh_3d(2, 2, 2)


def _abstract_batch(B, H, W, Q, n_classes, mesh):
    data = NamedSharding(mesh, P("data"))

    def sd(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=data)

    images = sd((B, H, W, 3), jnp.float32)
    pad_mask = sd((B, H, W), jnp.bool_)
    targets = {
        "boxes": sd((B, Q, 4), jnp.float32),
        "labels": sd((B, Q), jnp.int32),
        "n_boxes": sd((B,), jnp.int32),
        "relative_position": sd((B, Q, 3), jnp.float32),
        "relative_rotation": sd((B, Q, 3, 3), jnp.float32),
    }
    return images, pad_mask, targets


@pytest.mark.slow
@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_paper_config_train_step_compiles_on_mesh():
    """Full paper-config train step (5/5/16/256, 480x640, fused-T encoder)
    AOT-compiled on dp=2 x sp=2 x tp=2."""
    from poet_tpu.config import PoETConfig
    from poet_tpu.engine.train import TrainState, make_optimizer, make_train_step
    from poet_tpu.models import build_model
    from poet_tpu.parallel.tp import param_shardings

    cfg = PoETConfig()
    cfg.backbone.name = "maskrcnn"
    cfg.model.dtype = "bfloat16"
    cfg.model.enc_deform_impl = "fused"
    model = build_model(cfg)

    mesh = _mesh_222()
    B, H, W, Q = 4, 480, 640, cfg.model.num_queries
    images, pad_mask, targets = _abstract_batch(
        B, H, W, Q, cfg.model.n_classes, mesh)

    params = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), images, pad_mask, targets)
    shardings = param_shardings(params, mesh)
    params = jax.tree_util.tree_map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        params, shardings)
    tx = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = jax.eval_shape(tx.init, params)
    state = jax.tree_util.tree_map(
        lambda s: s if isinstance(s, jax.ShapeDtypeStruct)
        else jax.ShapeDtypeStruct(np.shape(s), jnp.asarray(s).dtype),
        TrainState(params=params, opt_state=opt_state,
                   step=jax.ShapeDtypeStruct((), jnp.int32)))

    step_fn = make_train_step(model, cfg, tx, donate=False)
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
    with jax.set_mesh(mesh):
        compiled = step_fn.lower(
            state, images, pad_mask, targets, rng).compile()
    # geometry sanity: the fused-T q axis padded to _QT x n_seq tiles
    text = compiled.as_text()
    assert text  # compiled artifact exists


@pytest.mark.slow
@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_yolo_full_pyramid_forward_compiles_on_mesh():
    """YOLOv4-CSP full reference pyramid (S=6380 tokens, stride 8/16/32 +
    extras) backbone-mode forward AOT-compiled on dp=2 x sp=2 x tp=2."""
    import os

    from poet_tpu.config import PoETConfig
    from poet_tpu.models import build_model
    from poet_tpu.parallel.tp import param_shardings

    cfg = PoETConfig()
    cfg.model.dtype = "bfloat16"
    cfg.model.bbox_mode = "backbone"
    cfg.model.enc_deform_impl = "fused"
    cfg.model.n_classes = 21
    cfg.backbone.name = "yolov4"
    cfg.backbone.cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "ycbv_yolov4-csp.cfg")
    cfg.backbone.max_detections = 20
    cfg.backbone.encoder_min_stride = 1
    model = build_model(cfg)

    mesh = _mesh_222()
    B, H, W = 4, 480, 640
    data = NamedSharding(mesh, P("data"))
    images = jax.ShapeDtypeStruct((B, H, W, 3), jnp.float32, sharding=data)
    pad_mask = jax.ShapeDtypeStruct((B, H, W), jnp.bool_, sharding=data)

    params = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), images, pad_mask, None)
    shardings = param_shardings(params, mesh)
    params = jax.tree_util.tree_map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        params, shardings)

    fwd = jax.jit(
        lambda p, i, m: model.apply(p, i, m, None, deterministic=True))
    with jax.set_mesh(mesh):
        compiled = fwd.lower(params, images, pad_mask).compile()
    assert compiled.as_text()
