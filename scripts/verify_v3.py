"""Drive the fused v3 deformable-sampling kernel on the REAL TPU chip.

Checks, at realistic encoder shapes (Mask R-CNN pyramid, bs=16):
  * forward output finite and matching ms_deform_attn_xla on-chip,
  * fused custom-VJP gradients matching autodiff of the XLA reference,
  * a model-level forward with enc_deform_impl='fused'.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/verify_v3.py
"""

from __future__ import annotations

import numpy as np

SHAPES = [(30, 40), (15, 20), (8, 10), (4, 5)]


def main():
    import jax
    import jax.numpy as jnp

    from poet_tpu.ops.deform_attn import ms_deform_attn_xla
    from poet_tpu.ops.deform_attn_pallas_v3 import (
        ms_deform_attn_fused, ms_deform_attn_pallas_v3)

    print("devices:", jax.devices())
    B, H, D, L, P = 4, 16, 16, 4, 4
    S = sum(h * w for h, w in SHAPES)
    Q = S
    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.1, 1.1, size=(B, Q, H, L, P, 2)),
                      jnp.float32)
    attn = jnp.asarray(rng.uniform(size=(B, Q, H, L, P)), jnp.float32)
    attn = attn / attn.sum(axis=(-2, -1), keepdims=True)

    ref = jax.jit(lambda v, l, a: ms_deform_attn_xla(v, SHAPES, l, a))(
        value, loc, attn)
    out = jax.jit(lambda v, l, a: ms_deform_attn_pallas_v3(v, SHAPES, l, a))(
        value, loc, attn)
    err = float(jnp.abs(out - ref).max())
    scale = float(jnp.abs(ref).max())
    assert np.isfinite(np.asarray(out)).all()
    print(f"fwd TPU: max|v3-xla| = {err:.2e} (scale {scale:.2f})")
    assert err < 1e-4 * max(scale, 1.0), err

    def loss_ref(v, l, a):
        return jnp.sum(jnp.sin(3.0 * ms_deform_attn_xla(v, SHAPES, l, a)))

    def loss_v3(v, l, a):
        return jnp.sum(jnp.sin(3.0 * ms_deform_attn_fused(v, SHAPES, l, a)))

    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(value, loc, attn)
    gv = jax.jit(jax.grad(loss_v3, argnums=(0, 1, 2)))(value, loc, attn)
    for n, (a, b) in zip(["d_value", "d_loc", "d_attn"], zip(gr, gv)):
        e = float(jnp.abs(a - b).max())
        s = float(jnp.abs(a).max())
        assert np.isfinite(np.asarray(b)).all()
        print(f"bwd TPU {n}: max err {e:.2e} (scale {s:.1f})")
        assert e < 2e-3 * max(s, 1.0), (n, e, s)

    # packed-bf16 path (y-mix + dg construction run as packed bf16 vops):
    # bf16 inputs, compared loosely against the f32 autodiff reference
    def loss_v3_bf16(v, l, a):
        return jnp.sum(jnp.sin(3.0 * ms_deform_attn_fused(
            v.astype(jnp.bfloat16), SHAPES, l, a).astype(jnp.float32)))

    out16 = jax.jit(lambda v, l, a: ms_deform_attn_pallas_v3(
        v.astype(jnp.bfloat16), SHAPES, l, a))(value, loc, attn)
    e = float(jnp.abs(out16.astype(jnp.float32) - ref).max())
    print(f"fwd TPU bf16 (packed y-mix): max|v3-xla| = {e:.2e}")
    assert e < 3e-2 * max(scale, 1.0), e
    g16 = jax.jit(jax.grad(loss_v3_bf16, argnums=(0, 1, 2)))(value, loc, attn)
    for n, (a, b) in zip(["d_value", "d_loc", "d_attn"], zip(gr, g16)):
        e = float(jnp.abs(a - b.astype(jnp.float32)).max())
        s = max(float(jnp.abs(a).max()), 1.0)
        assert np.isfinite(np.asarray(b, np.float32)).all()
        print(f"bwd TPU bf16 {n}: max err {e:.2e} (rel {e/s:.2e})")
        assert e < 5e-2 * s, (n, e, s)

    # partitioned path on a 1-device mesh: exercises the custom_partitioning
    # lowering (Shardy rules + partition callbacks) on the real backend
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as Pp

    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    with jax.set_mesh(mesh):
        vs = jax.device_put(value, NamedSharding(mesh, Pp("data")))
        ls = jax.device_put(loc, NamedSharding(mesh, Pp("data")))
        as_ = jax.device_put(attn, NamedSharding(mesh, Pp("data")))
        out_m = jax.jit(lambda v, l, a: ms_deform_attn_fused(
            v, SHAPES, l, a))(vs, ls, as_)
        gm = jax.jit(jax.grad(loss_v3, argnums=(0, 1, 2)))(vs, ls, as_)
    e = float(jnp.abs(out_m - ref).max())
    print(f"mesh-partitioned fwd: max err {e:.2e}")
    assert e < 1e-4, e
    for n, (a, b) in zip(["d_value", "d_loc", "d_attn"], zip(gv, gm)):
        e = float(jnp.abs(a - b).max())
        assert e < 1e-5 * max(float(jnp.abs(a).max()), 1.0), (n, e)
    print("mesh-partitioned bwd: matches unpartitioned kernels")

    # model-level: flagship forward with the fused encoder core
    import __graft_entry__ as g

    cfg, model, images, pad_mask, targets = g._flagship_setup(
        B=2, H=480, W=640, dtype="bfloat16")
    cfg.model.enc_deform_impl = "fused"
    from poet_tpu.models import build_model

    model = build_model(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad_mask,
                                 targets)
    out = jax.jit(lambda p, i, m, t: model.apply(p, i, m, t,
                                                 deterministic=True))(
        params, images, pad_mask, targets)
    t = np.asarray(out["translations"][-1], np.float32)
    assert np.isfinite(t).all()
    print("model fwd (fused, bf16, 480x640): finite; t[0,0] =", t[0, 0])
    print("VERIFY OK")


if __name__ == "__main__":
    main()
