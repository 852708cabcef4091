"""Full jitted train step over the virtual 8-device data-parallel mesh."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

import jax
import jax.numpy as jnp

from poet_tpu.config import PoETConfig
from poet_tpu.engine.train import (
    TrainState,
    init_train_state,
    label_params,
    make_optimizer,
    make_train_step,
)
from poet_tpu.models import build_model
from poet_tpu.parallel.mesh import create_mesh, replicate, shard_batch

from tests.test_model import make_batch, tiny_config


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(5)
    cfg = tiny_config()
    cfg.optim.lr = 1e-3
    model = build_model(cfg)
    images, pad_mask, targets = make_batch(rng, B=8, H=64, W=64)
    tx = make_optimizer(cfg, None, steps_per_epoch=10)  # labels need params; fix below
    return cfg, model, (images, pad_mask, targets)


def test_data_parallel_train_steps(setup):
    cfg, model, (images, pad_mask, targets) = setup
    mesh = create_mesh()
    assert mesh.devices.size == 8

    params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)
    tx = make_optimizer(cfg, params, steps_per_epoch=100)
    state = TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))

    state = jax.device_put(state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    batch = shard_batch({"images": images, "pad_mask": pad_mask, **targets}, mesh)
    targets_s = {k: batch[k] for k in targets}

    step_fn = make_train_step(model, cfg, tx, donate=False)
    backbone_before = jax.tree_util.tree_leaves(
        jax.device_get(state.params["params"]["backbone"])
    )

    losses = []
    st = state
    for i in range(3):
        st, metrics = step_fn(st, batch["images"], batch["pad_mask"], targets_s,
                              jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))

    assert all(np.isfinite(l) for l in losses)
    assert int(st.step) == 3
    # frozen backbone untouched
    backbone_after = jax.tree_util.tree_leaves(
        jax.device_get(st.params["params"]["backbone"])
    )
    for b, a in zip(backbone_before, backbone_after):
        np.testing.assert_array_equal(b, a)
    # trainable params moved
    t_before = jax.device_get(params["params"]["transformer"]["encoder_layer_0"]["linear1"]["kernel"])
    t_after = jax.device_get(st.params["params"]["transformer"]["encoder_layer_0"]["linear1"]["kernel"])
    assert np.abs(t_after - t_before).max() > 0

    # loss should drop over a few more steps on a fixed batch
    for i in range(12):
        st, metrics = step_fn(st, batch["images"], batch["pad_mask"], targets_s,
                              jax.random.PRNGKey(100 + i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_param_labels(setup):
    cfg, model, (images, pad_mask, targets) = setup
    params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)
    labels = label_params(params, cfg)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    seen = {}
    for path, lab in flat:
        name = jax.tree_util.keystr(path)
        seen.setdefault(lab, []).append(name)
    assert all("backbone" in n for n in seen["frozen"])
    assert any("sampling_offsets" in n for n in seen["linear_proj"])
    assert any("reference_points" in n for n in seen["linear_proj"]) or not any(
        "reference_points" in n for ns in seen.values() for n in ns
    )
    assert len(seen["main"]) > 10


def test_calibrate_labels(setup):
    cfg, model, (images, pad_mask, targets) = setup
    import dataclasses
    cfg2 = PoETConfig.from_dict(cfg.to_dict())
    cfg2.model.aleatoric = True
    cfg2.model.calibrate = True
    model2 = build_model(cfg2)
    params = model2.init(jax.random.PRNGKey(0), images, pad_mask, targets)
    labels = label_params(params, cfg2)
    for path, lab in jax.tree_util.tree_leaves_with_path(labels):
        name = jax.tree_util.keystr(path)
        if "aleatoric" in name:
            assert lab == "main", name
        else:
            assert lab == "frozen", name


def test_lr_schedule():
    from poet_tpu.engine.train import make_lr_schedule

    sched = make_lr_schedule(2e-4, lr_drop_epochs=2, steps_per_epoch=10)
    assert sched(0) == pytest.approx(2e-4)
    assert sched(19) == pytest.approx(2e-4)
    assert sched(20) == pytest.approx(2e-5)
    assert sched(45) == pytest.approx(2e-6)


def test_calibrate_only_updates_aleatoric(setup):
    """Calibrate mode: aleatoric heads train, everything else frozen
    (main.py:337-347)."""
    cfg, model, (images, pad_mask, targets) = setup
    cfg2 = PoETConfig.from_dict(cfg.to_dict())
    cfg2.model.aleatoric = True
    cfg2.model.calibrate = True
    cfg2.optim.lr = 1e-3
    from poet_tpu.models import build_model

    model2 = build_model(cfg2)
    params = model2.init(jax.random.PRNGKey(0), images, pad_mask, targets)
    tx = make_optimizer(cfg2, params, steps_per_epoch=10)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step_fn = make_train_step(model2, cfg2, tx, donate=False)
    st, metrics = step_fn(state, images, pad_mask, targets, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    before = jax.tree_util.tree_leaves_with_path(params)
    after_tree = st.params
    changed, frozen_moved = [], []
    for path, b in before:
        name = jax.tree_util.keystr(path)
        a = after_tree
        for k in [p.key for p in path]:
            a = a[k]
        moved = float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max()) > 0
        if "aleatoric" in name:
            if moved:
                changed.append(name)
        elif moved:
            frozen_moved.append(name)
    assert changed, "aleatoric heads did not update"
    assert not frozen_moved, frozen_moved[:5]


def test_gradient_accumulation(setup):
    """grad_accum_steps=2 with the SAME micro-batch twice must (a) leave
    params untouched after the first micro-step and (b) land on exactly the
    accum=1 update after the second (mean of identical grads = the grad)."""
    cfg, model, (images, pad_mask, targets) = setup
    params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)
    rng = jax.random.PRNGKey(3)

    import copy

    cfg1 = copy.deepcopy(cfg)
    tx1 = make_optimizer(cfg1, params, steps_per_epoch=10)
    s1 = TrainState(params=params, opt_state=tx1.init(params),
                    step=jnp.zeros((), jnp.int32))
    step1 = make_train_step(model, cfg1, tx1, donate=False)
    ref_state, _ = step1(s1, images, pad_mask, targets, rng)

    cfg2 = copy.deepcopy(cfg)
    cfg2.optim.grad_accum_steps = 2
    tx2 = make_optimizer(cfg2, params, steps_per_epoch=10)
    s2 = TrainState(params=params, opt_state=tx2.init(params),
                    step=jnp.zeros((), jnp.int32))
    step2 = make_train_step(model, cfg2, tx2, donate=False)
    mid, _ = step2(s2, images, pad_mask, targets, rng)
    # no update yet: params identical to the init
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(mid.params),
        jax.tree_util.tree_leaves_with_path(params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(pa))
    final, _ = step2(mid, images, pad_mask, targets, rng)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(final.params),
        jax.tree_util.tree_leaves_with_path(ref_state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg=jax.tree_util.keystr(pa))


def test_grad_accum_lr_drop_epoch_alignment():
    """Under MultiSteps the inner schedule counts UPDATES (one per
    grad_accum_steps micro-batches); the StepLR drop must still land at the
    configured EPOCH of micro-steps (regression: the schedule was sized in
    micro-batches, firing the drop grad_accum_steps x too late)."""
    import optax
    from poet_tpu.engine.train import make_optimizer

    cfg = PoETConfig()
    cfg.optim.sgd = True
    cfg.optim.weight_decay = 0.0
    cfg.optim.clip_max_norm = 0.0
    cfg.optim.grad_accum_steps = 2
    cfg.optim.lr_drop = 1          # drop 10x after every epoch
    lr = cfg.optim.lr
    steps_per_epoch = 4            # micro-steps per epoch

    params = {"params": {"head": {"kernel": jnp.zeros((3,))}}}
    tx = make_optimizer(cfg, params, steps_per_epoch=steps_per_epoch)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    deltas = []
    p = params
    for _ in range(2 * steps_per_epoch):   # two epochs of micro-steps
        upd, state = tx.update(grads, state, p)
        prev = p["params"]["head"]["kernel"]
        p = optax.apply_updates(p, upd)
        deltas.append(float(np.asarray(p["params"]["head"]["kernel"][0] - prev[0])))

    # sgd(momentum=0.9), constant unit grads: velocity v_k = sum 0.9^i,
    # delta per UPDATE = -lr_epoch * v_k; micro-steps between updates are 0.
    v = 0.0
    expect = []
    for k in range(2 * steps_per_epoch // 2):       # 4 updates
        v = 0.9 * v + 1.0
        lr_k = lr * (0.1 ** (k // (steps_per_epoch // 2)))  # 2 updates/epoch
        expect.extend([0.0, -lr_k * v])
    np.testing.assert_allclose(deltas, expect, rtol=1e-5, atol=1e-9)


def test_zero_boxes_batch_stays_finite(setup):
    """A batch where every image has ZERO ground-truth boxes (legal after the
    degenerate-box filter) must produce a finite loss and finite gradients —
    the max(n_matched, 1) normalization plus masked gathers may not leak NaN
    through the where-gradient trap."""
    cfg, model, (images, pad_mask, targets) = setup
    import copy

    t0 = {k: np.array(v) for k, v in targets.items()}
    Q = t0["boxes"].shape[1]
    t0["boxes"][:] = -1.0
    t0["labels"][:] = -1
    t0["n_boxes"][:] = 0
    t_zero = {k: jnp.asarray(v) for k, v in t0.items()}

    params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)
    cfgz = copy.deepcopy(cfg)
    tx = make_optimizer(cfgz, params, steps_per_epoch=10)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(model, cfgz, tx, donate=False)

    new_state, metrics = step(state, images, pad_mask, t_zero,
                              jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"])), metrics["loss"]
    assert np.isfinite(float(metrics["grad_norm"])), metrics["grad_norm"]
    for path, leaf in jax.tree_util.tree_leaves_with_path(new_state.params):
        assert np.isfinite(np.asarray(leaf)).all(), jax.tree_util.keystr(path)

    # mixed batch: first image empty, rest unchanged
    t1 = {k: np.array(v) for k, v in targets.items()}
    t1["boxes"][0] = -1.0
    t1["labels"][0] = -1
    t1["n_boxes"][0] = 0
    t_mixed = {k: jnp.asarray(v) for k, v in t1.items()}
    _, metrics2 = step(state, images, pad_mask, t_mixed, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics2["loss"]))
    assert np.isfinite(float(metrics2["grad_norm"]))


def test_mu_bf16_moments(setup):
    """--mu_bf16 keeps the AdamW first moment in bfloat16 (half memory) while
    training still converges on a fixed batch."""
    cfg, model, (images, pad_mask, targets) = setup
    import copy

    cfgm = copy.deepcopy(cfg)
    cfgm.optim.mu_bf16 = True
    params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)
    tx = make_optimizer(cfgm, params, steps_per_epoch=10)
    opt_state = tx.init(params)

    mu_dtypes = set()
    def walk(t):
        if hasattr(t, "mu"):
            for leaf in jax.tree_util.tree_leaves(t.mu):
                mu_dtypes.add(leaf.dtype)
        if isinstance(t, (tuple, list)):
            for s in t:
                walk(s)
        elif isinstance(t, dict):
            for s in t.values():
                walk(s)
    walk(opt_state)
    assert jnp.dtype(jnp.bfloat16) in mu_dtypes, mu_dtypes

    state = TrainState(params=params, opt_state=opt_state,
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(model, cfgm, tx, donate=False)
    losses = []
    for i in range(8):
        state, metrics = step(state, images, pad_mask, targets,
                              jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses


def test_rbg_prng_train_step(setup):
    """--rng_impl rbg (cheap TPU dropout-mask generation) must train: keys
    created under jax_default_prng_impl='rbg' flow through the step's
    fold_in/split/dropout chain and produce finite losses."""
    cfg, model, (images, pad_mask, targets) = setup
    prev = jax.config.jax_default_prng_impl
    jax.config.update("jax_default_prng_impl", "rbg")
    try:
        params = model.init(jax.random.PRNGKey(0), images, pad_mask, targets)
        tx = make_optimizer(cfg, params, steps_per_epoch=10)
        state = TrainState(params=params, opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32))
        step = make_train_step(model, cfg, tx, donate=False)
        for i in range(2):
            state, metrics = step(state, images, pad_mask, targets,
                                  jax.random.PRNGKey(i))
            assert np.isfinite(float(metrics["loss"]))
    finally:
        jax.config.update("jax_default_prng_impl", prev)
