"""custom_partitioning rules of the fused sampling op on the 8-device mesh.

Interpret-mode Pallas lowers to io_callbacks that XLA's SPMD partitioner
rejects, so these tests swap the inner kernels for the XLA reference
implementation (monkeypatch) — what is under test is the sharding machinery:
the Shardy rules, the partition callbacks, and the fwd/bwd result assembly
under batch ('data') and head ('model') sharding. The kernel's own numerics
are covered by tests/test_deform_attn_pallas_v3.py (interpret mode) and
scripts/verify_v3.py (real chip; includes a 1-device-mesh run of this exact
partitioned path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from poet_tpu.ops.deform_attn import ms_deform_attn_xla
from poet_tpu.ops import deform_attn_pallas_v3 as v3

SHAPES = ((7, 9), (4, 5))


# the sep implementation is const-free under tracing (lax.iota-based);
# ms_deform_attn_xla's corner-index jnp.arrays become jaxpr consts under
# vjp, which custom_partitioning's trace rejects.
from poet_tpu.ops.deform_attn import ms_deform_attn_sep


def _xla_fwd(value, spatial_shapes, loc, attn):
    return ms_deform_attn_sep(value, spatial_shapes, loc, attn)


def _xla_bwd(value, loc, attn, dout, spatial_shapes):
    _, vjp = jax.vjp(
        lambda v, l, a: ms_deform_attn_sep(v, spatial_shapes, l, a),
        value, loc, attn)
    return vjp(dout)


def _t_xla_fwd(value, spatial_shapes, locT, attnT):
    """XLA twin of _v3_t_impl: flat (B, F, Q) layouts -> sep core."""
    B, S, H, D = value.shape
    L = len(spatial_shapes)
    P = attnT.shape[1] // (H * L)
    Qp = locT.shape[2]
    loc = locT.transpose(0, 2, 1).reshape(B, Qp, H, L, P, 2)
    attn = attnT.transpose(0, 2, 1).reshape(B, Qp, H, L, P)
    S_lv = sum(h * w for h, w in spatial_shapes)
    out = ms_deform_attn_sep(value[:, :S_lv], spatial_shapes, loc, attn)
    return out.astype(value.dtype)


def _t_xla_bwd(value, locT, attnT, dout, spatial_shapes):
    _, vjp = jax.vjp(
        lambda v, l, a: _t_xla_fwd(v, spatial_shapes, l, a),
        value, locT, attnT)
    return vjp(dout)


def _t2_xla_fwd(value, spatial_shapes, locT, attnT):
    """XLA twin of _v3_t2_impl: kernel-native (B, H*D, Q_pad) result."""
    return _t_xla_fwd(value, spatial_shapes, locT, attnT).transpose(0, 2, 1)


def _t2_xla_bwd(value, locT, attnT, dout, spatial_shapes):
    _, vjp = jax.vjp(
        lambda v, l, a: _t2_xla_fwd(v, spatial_shapes, l, a),
        value, locT, attnT)
    return vjp(dout)


_ALL_CACHES = ("_sharded_fwd", "_sharded_bwd", "_sharded_fwd_t",
               "_sharded_bwd_t", "_sharded_fwd_t2", "_sharded_bwd_t2")


@pytest.fixture(autouse=True)
def _xla_inner(monkeypatch):
    monkeypatch.setattr(v3, "ms_deform_attn_pallas_v3", _xla_fwd)
    monkeypatch.setattr(v3, "_v3_bwd_impl", _xla_bwd)
    monkeypatch.setattr(v3, "_v3_t_impl", _t_xla_fwd)
    monkeypatch.setattr(v3, "_v3_t_bwd_impl", _t_xla_bwd)
    monkeypatch.setattr(v3, "_v3_t2_impl", _t2_xla_fwd)
    monkeypatch.setattr(v3, "_v3_t2_bwd_impl", _t2_xla_bwd)
    # the custom_partitioning wrappers are cached per spatial_shapes and
    # resolve the module globals at call time, so the patch reaches them;
    # clear anyway so rules rebuilt per test see a clean state.
    for name in _ALL_CACHES:
        getattr(v3, name).cache_clear()
    yield
    for name in _ALL_CACHES:
        getattr(v3, name).cache_clear()


def _inputs(rng, B=4, Q=13, H=4, D=8):
    L, Pn = len(SHAPES), 4
    S = sum(h * w for h, w in SHAPES)
    value = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, size=(B, Q, H, L, Pn, 2)),
                      jnp.float32)
    attn = jnp.asarray(rng.uniform(size=(B, Q, H, L, Pn)), jnp.float32)
    attn = attn / attn.sum(axis=(-2, -1), keepdims=True)
    return value, loc, attn


def _mesh():
    return Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))


def test_fused_fwd_sharded_matches_unsharded(rng):
    value, loc, attn = _inputs(rng)
    ref = ms_deform_attn_xla(value, SHAPES, loc, attn)

    mesh = _mesh()
    with jax.set_mesh(mesh):
        vs = jax.device_put(value, NamedSharding(mesh, P("data", None, "model", None)))
        ls = jax.device_put(loc, NamedSharding(mesh, P("data", None, "model", None, None, None)))
        as_ = jax.device_put(attn, NamedSharding(mesh, P("data", None, "model", None, None)))
        fn = jax.jit(lambda v, l, a: v3.ms_deform_attn_fused(v, SHAPES, l, a))
        out = fn(vs, ls, as_)
        # b/h sharding is native to the op: the partitioner must not
        # all-gather the operands to run it
        hlo = fn.lower(vs, ls, as_).compile().as_text()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    assert "all-gather" not in hlo, "fwd should shard over b/h without gathers"


def test_fused_grads_sharded_match_unsharded(rng):
    value, loc, attn = _inputs(rng)

    def loss(fn):
        return lambda v, l, a: jnp.sum(jnp.sin(3.0 * fn(v, SHAPES, l, a)))

    gr = jax.grad(loss(ms_deform_attn_xla), argnums=(0, 1, 2))(
        value, loc, attn)

    mesh = _mesh()
    with jax.set_mesh(mesh):
        vs = jax.device_put(value, NamedSharding(mesh, P("data", None, "model", None)))
        ls = jax.device_put(loc, NamedSharding(mesh, P("data", None, "model", None, None, None)))
        as_ = jax.device_put(attn, NamedSharding(mesh, P("data", None, "model", None, None)))
        gv = jax.jit(jax.grad(loss(v3.ms_deform_attn_fused),
                              argnums=(0, 1, 2)))(vs, ls, as_)
    for a, b in zip(gr, gv):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_fused_data_only_sharding(rng):
    value, loc, attn = _inputs(rng, B=8)
    ref = ms_deform_attn_xla(value, SHAPES, loc, attn)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    with jax.set_mesh(mesh):
        vs = jax.device_put(value, NamedSharding(mesh, P("data")))
        ls = jax.device_put(loc, NamedSharding(mesh, P("data")))
        as_ = jax.device_put(attn, NamedSharding(mesh, P("data")))
        out = jax.jit(lambda v, l, a: v3.ms_deform_attn_fused(v, SHAPES, l, a))(
            vs, ls, as_)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_fwd_query_sharded(rng):
    """Sequence-parallel: the query/token axis sharded in the forward."""
    value, loc, attn = _inputs(rng, B=2, Q=16)
    ref = ms_deform_attn_xla(value, SHAPES, loc, attn)

    mesh = _mesh()  # ('data', 'model') = (4, 2)
    with jax.set_mesh(mesh):
        vs = jax.device_put(value, NamedSharding(mesh, P(None, None, "model", None)))
        ls = jax.device_put(loc, NamedSharding(mesh, P(None, "data", "model", None, None, None)))
        as_ = jax.device_put(attn, NamedSharding(mesh, P(None, "data", "model", None, None)))
        out = jax.jit(lambda v, l, a: v3.ms_deform_attn_fused(v, SHAPES, l, a))(
            vs, ls, as_)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_grads_query_sharded(rng):
    """q-sharded backward: d_loc/d_attn stay sharded, d_value is psummed."""
    value, loc, attn = _inputs(rng, B=2, Q=16)

    def loss(fn):
        return lambda v, l, a: jnp.sum(jnp.sin(3.0 * fn(v, SHAPES, l, a)))

    gr = jax.grad(loss(ms_deform_attn_xla), argnums=(0, 1, 2))(value, loc, attn)

    mesh = _mesh()
    with jax.set_mesh(mesh):
        vs = jax.device_put(value, NamedSharding(mesh, P(None, None, "model", None)))
        ls = jax.device_put(loc, NamedSharding(mesh, P(None, "data", "model", None, None, None)))
        as_ = jax.device_put(attn, NamedSharding(mesh, P(None, "data", "model", None, None)))
        gv = jax.jit(jax.grad(loss(v3.ms_deform_attn_fused),
                              argnums=(0, 1, 2)))(vs, ls, as_)
    for a, b in zip(gr, gv):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def _t_inputs(rng, B=4, Q=16, H=4, D=8):
    """Inputs in the T entry's flat layouts (Q already tile-aligned for the
    patched XLA twin; the real kernel's _QT constraint is exercised by
    tests/test_deform_attn_fused_t.py in interpret mode)."""
    value, loc, attn = _inputs(rng, B=B, Q=Q, H=H, D=D)
    locT = loc.reshape(B, Q, -1).transpose(0, 2, 1)      # (B, H*L*P*2, Q)
    attnT = attn.reshape(B, Q, -1).transpose(0, 2, 1)    # (B, H*L*P, Q)
    return value, loc, attn, locT, attnT


def test_fused_t_fwd_sharded_matches_unsharded(rng):
    """T entry (VERDICT r4 #2): b/h sharding native, no operand gathers."""
    value, loc, attn, locT, attnT = _t_inputs(rng)
    ref = ms_deform_attn_xla(value, SHAPES, loc, attn)

    mesh = _mesh()
    with jax.set_mesh(mesh):
        vs = jax.device_put(value, NamedSharding(mesh, P("data", None, "model", None)))
        ls = jax.device_put(locT, NamedSharding(mesh, P("data", "model", None)))
        as_ = jax.device_put(attnT, NamedSharding(mesh, P("data", "model", None)))
        fn = jax.jit(lambda v, l, a: v3.ms_deform_attn_fused_t(v, SHAPES, l, a))
        out = fn(vs, ls, as_)
        hlo = fn.lower(vs, ls, as_).compile().as_text()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    assert "all-gather" not in hlo, "T fwd should shard over b/h without gathers"


def test_fused_t_grads_batch_query_head_sharded(rng):
    """T entry under the full dp x sp x tp train-mesh shape: forward and all
    three gradients match the unsharded XLA reference; d_value is psummed
    over the 'seq' (query) axis by the partition impl."""
    value, loc, attn, locT, attnT = _t_inputs(rng)
    Q = loc.shape[1]

    def loss_ref(v, l, a):
        return jnp.sum(jnp.sin(3.0 * ms_deform_attn_xla(v, SHAPES, l, a)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(value, loc, attn)
    # reference grads in the flat T layouts
    B = value.shape[0]
    gr_locT = gr[1].reshape(B, Q, -1).transpose(0, 2, 1)
    gr_attnT = gr[2].reshape(B, Q, -1).transpose(0, 2, 1)

    def loss_t(v, l, a):
        return jnp.sum(jnp.sin(
            3.0 * v3.ms_deform_attn_fused_t(v, SHAPES, l, a)[:, :Q]))

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 2, 2),
                ("data", "seq", "model"))
    with jax.set_mesh(mesh):
        vs = jax.device_put(value, NamedSharding(mesh, P("data", None, "model", None)))
        ls = jax.device_put(locT, NamedSharding(mesh, P("data", "model", "seq")))
        as_ = jax.device_put(attnT, NamedSharding(mesh, P("data", "model", "seq")))
        gv = jax.jit(jax.grad(loss_t, argnums=(0, 1, 2)))(vs, ls, as_)
    np.testing.assert_allclose(np.asarray(gv[0]), np.asarray(gr[0]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gv[1]), np.asarray(gr_locT),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gv[2]), np.asarray(gr_attnT),
                               atol=1e-4, rtol=1e-4)


def test_fused_grads_batch_query_head_sharded(rng):
    """All three parallel axes at once (dp x sp x tp shape of the train mesh)."""
    value, loc, attn = _inputs(rng, B=4, Q=16)

    def loss(fn):
        return lambda v, l, a: jnp.sum(jnp.sin(3.0 * fn(v, SHAPES, l, a)))

    gr = jax.grad(loss(ms_deform_attn_xla), argnums=(0, 1, 2))(value, loc, attn)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 2, 2),
                ("data", "seq", "model"))
    with jax.set_mesh(mesh):
        vs = jax.device_put(value, NamedSharding(mesh, P("data", None, "model", None)))
        ls = jax.device_put(loc, NamedSharding(mesh, P("data", "seq", "model", None, None, None)))
        as_ = jax.device_put(attn, NamedSharding(mesh, P("data", "seq", "model", None, None)))
        gv = jax.jit(jax.grad(loss(v3.ms_deform_attn_fused),
                              argnums=(0, 1, 2)))(vs, ls, as_)
    for a, b in zip(gr, gv):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_fused_t2_fwd_sharded_matches_unsharded(rng):
    """T2 entry (kernel-native result layout): b/h sharding native, no
    operand gathers; the output's head axis is dim 1."""
    value, loc, attn, locT, attnT = _t_inputs(rng)
    ref = ms_deform_attn_xla(value, SHAPES, loc, attn)

    mesh = _mesh()
    with jax.set_mesh(mesh):
        vs = jax.device_put(value, NamedSharding(mesh, P("data", None, "model", None)))
        ls = jax.device_put(locT, NamedSharding(mesh, P("data", "model", None)))
        as_ = jax.device_put(attnT, NamedSharding(mesh, P("data", "model", None)))
        fn = jax.jit(lambda v, l, a: v3.ms_deform_attn_fused_t2(v, SHAPES, l, a))
        out = fn(vs, ls, as_)
        hlo = fn.lower(vs, ls, as_).compile().as_text()
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1),
                               np.asarray(ref), atol=1e-5)
    assert "all-gather" not in hlo, "T2 fwd should shard over b/h without gathers"


def test_fused_t2_grads_batch_query_head_sharded(rng):
    """T2 under the full dp x sp x tp train-mesh shape: forward and all
    three gradients match the unsharded XLA reference; dout arrives
    kernel-native (B, H*D, Q) and d_value is psummed over 'seq'."""
    value, loc, attn, locT, attnT = _t_inputs(rng)
    Q = loc.shape[1]

    def loss_ref(v, l, a):
        return jnp.sum(jnp.sin(3.0 * ms_deform_attn_xla(v, SHAPES, l, a)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(value, loc, attn)
    B = value.shape[0]
    gr_locT = gr[1].reshape(B, Q, -1).transpose(0, 2, 1)
    gr_attnT = gr[2].reshape(B, Q, -1).transpose(0, 2, 1)

    def loss_t2(v, l, a):
        out = v3.ms_deform_attn_fused_t2(v, SHAPES, l, a)   # (B, HD, Q)
        return jnp.sum(jnp.sin(3.0 * out.transpose(0, 2, 1)[:, :Q]))

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 2, 2),
                ("data", "seq", "model"))
    with jax.set_mesh(mesh):
        vs = jax.device_put(value, NamedSharding(mesh, P("data", None, "model", None)))
        ls = jax.device_put(locT, NamedSharding(mesh, P("data", "model", "seq")))
        as_ = jax.device_put(attnT, NamedSharding(mesh, P("data", "model", "seq")))
        gv = jax.jit(jax.grad(loss_t2, argnums=(0, 1, 2)))(vs, ls, as_)
    np.testing.assert_allclose(np.asarray(gv[0]), np.asarray(gr[0]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gv[1]), np.asarray(gr_locT),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gv[2]), np.asarray(gr_attnT),
                               atol=1e-4, rtol=1e-4)
