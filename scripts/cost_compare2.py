"""Per-encoder-layer flops/bytes from cost_analysis deltas."""

from __future__ import annotations

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_setup
    from poet_tpu.models import build_model

    B = 16
    cfg, model, images, pad_mask, targets = _flagship_setup(B=B, H=480, W=640)
    res = {}
    for enc in (1, 3):
        cfg.model.enc_layers = enc
        cfg.model.dec_layers = 1
        model = build_model(cfg)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad_mask, targets)
        g = jax.jit(lambda p, im, model=model: model.apply(
            p, im, pad_mask, targets, deterministic=True)["translations"].mean())
        ca = g.lower(params, images).compile().cost_analysis()
        res[enc] = (ca["flops"], ca["bytes accessed"])
        print(enc, res[enc])
    df = (res[3][0] - res[1][0]) / 2
    db = (res[3][1] - res[1][1]) / 2
    print(f"per-enc-layer: {df/1e9:.1f} GFLOPs, {db/1e9:.2f} GB accessed")


if __name__ == "__main__":
    main()
