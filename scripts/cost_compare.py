"""Compare XLA cost analysis: standalone mxu op vs in-model encoder layer."""

from __future__ import annotations

import numpy as np

SHAPES = [(30, 40), (15, 20), (8, 10), (4, 5)]


def main():
    import jax
    import jax.numpy as jnp

    from poet_tpu.ops.deform_attn import ms_deform_attn_mxu

    B, H, D, L, P = 16, 16, 16, 4, 4
    S = sum(h * w for h, w in SHAPES)
    Q = S
    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(0, 1, size=(B, Q, H, L, P, 2)), jnp.float32)
    attn = jnp.asarray(rng.uniform(size=(B, Q, H, L, P)), jnp.float32)

    f = jax.jit(lambda v, l, a: ms_deform_attn_mxu(v, SHAPES, l, a))
    ca = f.lower(value, loc, attn).compile().cost_analysis()
    print("standalone:", {k: v for k, v in ca.items()
                          if k in ("flops", "transcendentals", "bytes accessed")})

    # in-model single encoder layer
    from __graft_entry__ import _flagship_setup
    from poet_tpu.models import build_model

    cfg, model, images, pad_mask, targets = _flagship_setup(B=B, H=480, W=640)
    cfg.model.enc_layers = 1
    cfg.model.dec_layers = 1
    model = build_model(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad_mask, targets)
    g = jax.jit(lambda p, im: model.apply(p, im, pad_mask, targets, deterministic=True)[
        "translations"].mean())
    ca2 = g.lower(params, images).compile().cost_analysis()
    print("model(enc=1,dec=1):", {k: v for k, v in ca2.items()
                                  if k in ("flops", "transcendentals", "bytes accessed")})


if __name__ == "__main__":
    main()
