"""Per-encoder-layer in-model cost: sweep enc_layers and difference."""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "float32"
    impl = sys.argv[2] if len(sys.argv) > 2 else "mxu"
    import jax
    import jax.numpy as jnp
    from jax import lax

    from __graft_entry__ import _flagship_setup
    from poet_tpu.models import build_model

    B = 16
    cfg, model, images, pad_mask, targets = _flagship_setup(B=B, H=480, W=640)
    cfg.model.dtype = dtype
    cfg.model.enc_deform_impl = impl

    for enc in (1, 3, 5):
        cfg.model.enc_layers = enc
        model = build_model(cfg)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad_mask, targets)

        def fwd_loop(n_iters, model=model):
            @jax.jit
            def loop(params, images, salt):
                def body(i, carry):
                    out = model.apply(params, images * (1.0 + carry * 1e-9 + salt),
                                      pad_mask, targets, deterministic=True)
                    return jnp.mean(out["translations"].astype(jnp.float32))
                return lax.fori_loop(0, n_iters, body, jnp.float32(0.0))
            return loop

        n = 4
        l1, l2 = fwd_loop(n), fwd_loop(2 * n)
        float(l1(params, images, jnp.float32(0.0)))
        float(l2(params, images, jnp.float32(0.0)))

        def timed(l, s):
            t0 = time.perf_counter()
            float(l(params, images, jnp.float32(s)))
            return time.perf_counter() - t0

        t1 = min(timed(l1, 1e-6), timed(l1, 2e-6))
        t2 = min(timed(l2, 3e-6), timed(l2, 4e-6))
        dt = max(t2 - t1, 1e-9) / n
        print(f"enc_layers={enc} dtype={dtype} impl={impl}: {dt*1e3:.2f} ms/batch")


if __name__ == "__main__":
    main()
