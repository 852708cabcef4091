"""ZeRO-1 optimizer-state sharding: identical training, sharded moments.

Extension test (no reference counterpart — the reference replicates the
optimizer state on every rank, /root/reference/main.py:272-283).
Runs on the virtual 8-device CPU mesh from conftest.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from poet_tpu.engine.train import TrainState, make_optimizer, make_train_step
from poet_tpu.models import build_model
from poet_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from poet_tpu.parallel.zero import (
    init_zero1_opt_state,
    opt_state_bytes_per_device,
    zero1_opt_state_shardings,
)

from tests.test_model import make_batch, tiny_config


pytestmark = pytest.mark.slow


def _moment_leaves(opt_state):
    """adamw mu/nu arrays (ndim >= 1, parameter-shaped)."""
    return [l for l in jax.tree_util.tree_leaves(opt_state)
            if hasattr(l, "ndim") and l.ndim >= 1]


def test_zero1_matches_replicated():
    rng = np.random.default_rng(7)
    cfg = tiny_config()
    cfg.optim.lr = 1e-3
    model = build_model(cfg)
    images, pad_mask, targets = make_batch(rng, B=8, H=64, W=64)
    mesh = create_mesh()
    assert mesh.devices.size == 8

    params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)
    tx = make_optimizer(cfg, params, steps_per_epoch=10)
    step_fn = make_train_step(model, cfg, tx, donate=False)

    batch = shard_batch({"images": images, "pad_mask": pad_mask, **targets}, mesh)
    targets_s = {k: batch[k] for k in targets}

    def run(opt_state, params_dev, n=3):
        st = TrainState(params=params_dev, opt_state=opt_state,
                        step=jnp.zeros((), jnp.int32))
        losses = []
        for i in range(n):
            st, metrics = step_fn(st, batch["images"], batch["pad_mask"],
                                  targets_s, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
        return st, losses

    # replicated baseline
    params_rep = replicate(params, mesh)
    st_rep, losses_rep = run(jax.jit(tx.init)(params_rep), params_rep)

    # ZeRO-1: moments sharded over 'data'
    opt_zero = init_zero1_opt_state(tx, params_rep, mesh)
    moments = _moment_leaves(opt_zero)
    sharded = [l for l in moments
               if any(a is not None for a in
                      jax.tree_util.tree_leaves(l.sharding.spec))]
    assert sharded, "no moment leaf was sharded over the data axis"
    assert (opt_state_bytes_per_device(opt_zero)
            < opt_state_bytes_per_device(st_rep.opt_state))

    st_zero, losses_zero = run(opt_zero, params_rep)

    # Tolerances: the ZeRO collective schedule reassociates the f32 update
    # sums (reduce-scatter + all-gather vs fused all-reduce). Single-ulp
    # moment differences pass through AdamW's m/(sqrt(v)+eps), which is
    # ulp-sensitive where both moments are near zero, so bound the ABSOLUTE
    # parameter deviation by a small fraction of lr (3 steps at lr=1e-3;
    # observed max ~8e-6).
    np.testing.assert_allclose(losses_zero, losses_rep, rtol=1e-4)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(st_zero.params),
        jax.tree_util.tree_leaves_with_path(st_rep.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=3e-5,
            err_msg=jax.tree_util.keystr(pa))

    # the updated opt state keeps its ZeRO placement (no silent re-replication)
    out_moments = _moment_leaves(st_zero.opt_state)
    assert any(
        any(a is not None for a in jax.tree_util.tree_leaves(l.sharding.spec))
        for l in out_moments
    ), "train step re-replicated the ZeRO-sharded moments"


def test_zero1_shardings_shape():
    """Sharding tree mirrors tx.init's treedef and replicates scalars."""
    rng = np.random.default_rng(3)
    cfg = tiny_config()
    model = build_model(cfg)
    images, pad_mask, targets = make_batch(rng, B=8, H=64, W=64)
    mesh = create_mesh()
    params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)
    tx = make_optimizer(cfg, params, steps_per_epoch=10)

    shardings = zero1_opt_state_shardings(tx, params, mesh)
    shapes = jax.eval_shape(tx.init, params)
    assert (jax.tree_util.tree_structure(shardings)
            == jax.tree_util.tree_structure(shapes))
    for sh, shape in zip(jax.tree_util.tree_leaves(shardings),
                         jax.tree_util.tree_leaves(shapes)):
        assert isinstance(sh, NamedSharding)
        if shape.ndim == 0:
            assert sh.spec == P()


def test_zero1_checkpoint_roundtrip(tmp_path):
    """save_checkpoint + restore with ZeRO-sharded moments: the host payload
    holds complete arrays and a resumed state trains identically."""
    rng = np.random.default_rng(11)
    cfg = tiny_config()
    model = build_model(cfg)
    images, pad_mask, targets = make_batch(rng, B=8, H=64, W=64)
    mesh = create_mesh()
    params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)
    tx = make_optimizer(cfg, params, steps_per_epoch=10)
    step_fn = make_train_step(model, cfg, tx, donate=False)
    batch = shard_batch({"images": images, "pad_mask": pad_mask, **targets}, mesh)
    targets_s = {k: batch[k] for k in targets}

    params_rep = replicate(params, mesh)
    opt_zero = init_zero1_opt_state(tx, params_rep, mesh)
    st = TrainState(params=params_rep, opt_state=opt_zero,
                    step=jnp.zeros((), jnp.int32))
    st, _ = step_fn(st, batch["images"], batch["pad_mask"], targets_s,
                    jax.random.PRNGKey(0))

    from poet_tpu.engine.checkpoint import load_checkpoint, save_checkpoint

    save_checkpoint(str(tmp_path), "ck", st, epoch=0, cfg=cfg)
    payload, _ = load_checkpoint(
        str(tmp_path / "ck"),
        template={"params": params, "opt_state": jax.tree_util.tree_map(
            np.asarray, jax.device_get(st.opt_state)), "step": 0, "epoch": 0})

    # restored moments equal the live sharded ones
    for a, b in zip(jax.tree_util.tree_leaves(payload["opt_state"]),
                    jax.tree_util.tree_leaves(st.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    # resume: re-place with zero shardings, next step matches uninterrupted
    from poet_tpu.parallel.zero import zero1_opt_state_shardings

    shardings = zero1_opt_state_shardings(tx, params_rep, mesh)
    st_resumed = TrainState(
        params=replicate(payload["params"], mesh),
        opt_state=jax.device_put(payload["opt_state"], shardings),
        step=jnp.asarray(payload["step"], jnp.int32))
    s1, m1 = step_fn(st, batch["images"], batch["pad_mask"], targets_s,
                     jax.random.PRNGKey(1))
    s2, m2 = step_fn(st_resumed, batch["images"], batch["pad_mask"], targets_s,
                     jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)


def test_all_optimizer_extensions_compose(tmp_path):
    """ZeRO-1 + mu_bf16 + grad_accum_steps in one training config: moments
    bf16 AND sharded, updates land every 2 micro-steps, loss finite."""
    import copy

    rng = np.random.default_rng(13)
    cfg = tiny_config()
    cfg = copy.deepcopy(cfg)
    cfg.optim.mu_bf16 = True
    cfg.optim.grad_accum_steps = 2
    model = build_model(cfg)
    images, pad_mask, targets = make_batch(rng, B=8, H=64, W=64)
    mesh = create_mesh()
    params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)
    tx = make_optimizer(cfg, params, steps_per_epoch=10)
    step_fn = make_train_step(model, cfg, tx, donate=False)
    batch = shard_batch({"images": images, "pad_mask": pad_mask, **targets}, mesh)
    targets_s = {k: batch[k] for k in targets}

    params_rep = replicate(params, mesh)
    opt = init_zero1_opt_state(tx, params_rep, mesh)

    moments = _moment_leaves(opt)
    assert any(l.dtype == jnp.dtype(jnp.bfloat16) for l in moments), \
        sorted({str(l.dtype) for l in moments})
    assert any(any(a is not None for a in jax.tree_util.tree_leaves(l.sharding.spec))
               for l in moments)

    st = TrainState(params=params_rep, opt_state=opt,
                    step=jnp.zeros((), jnp.int32))
    p0 = jax.device_get(params_rep)
    # micro-step 1: no update yet (accumulating)
    st, m = step_fn(st, batch["images"], batch["pad_mask"], targets_s,
                    jax.random.PRNGKey(0))
    for a, b in zip(jax.tree_util.tree_leaves(st.params),
                    jax.tree_util.tree_leaves(p0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # micro-step 2: update lands
    st, m = step_fn(st, batch["images"], batch["pad_mask"], targets_s,
                    jax.random.PRNGKey(1))
    moved = any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0
                for a, b in zip(jax.tree_util.tree_leaves(st.params),
                                jax.tree_util.tree_leaves(p0)))
    assert moved and np.isfinite(float(m["loss"]))
