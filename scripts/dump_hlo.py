"""Dump optimized HLO of the one-hot einsum core, in-model-like structure."""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from poet_tpu.ops.deform_attn import ms_deform_attn_mxu

    SHAPES = [(60, 80), (30, 40), (15, 20), (8, 10)]
    B, H, D, L, P = 16, 16, 16, 4, 4
    S = sum(h * w for h, w in SHAPES)
    Q = S
    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(0, 1, size=(B, Q, H, L, P, 2)), jnp.float32)
    attn = jnp.asarray(rng.uniform(size=(B, Q, H, L, P)), jnp.float32)

    f = jax.jit(lambda v, l, a: ms_deform_attn_mxu(v, SHAPES, l, a))
    txt = f.lower(value, loc, attn).compile().as_text()
    with open("/tmp/standalone_hlo.txt", "w") as fh:
        fh.write(txt)
    print("standalone HLO:", len(txt), "chars")
    import re
    for op in ("gather", "dynamic-slice", "dot(", "scatter", "select(", "iota"):
        print(f"  {op}: {txt.count(op)}")


if __name__ == "__main__":
    main()
