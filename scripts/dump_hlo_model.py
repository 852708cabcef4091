"""Dump optimized HLO of the enc=1 dec=1 model and count hot ops."""

import numpy as np


def main():
    import jax

    from __graft_entry__ import _flagship_setup
    from poet_tpu.models import build_model

    B = 16
    cfg, model, images, pad_mask, targets = _flagship_setup(B=B, H=480, W=640)
    cfg.model.enc_layers = 1
    cfg.model.dec_layers = 1
    model = build_model(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad_mask, targets)
    g = jax.jit(lambda p, im: model.apply(p, im, pad_mask, targets,
                                          deterministic=True)["translations"].mean())
    txt = g.lower(params, images).compile().as_text()
    with open("/tmp/model_hlo.txt", "w") as fh:
        fh.write(txt)
    print("model HLO:", len(txt), "chars")
    for op in ("gather", "dynamic-slice(", "scatter", "4800", "= s32[16,"):
        print(f"  {op}: {txt.count(op)}")


if __name__ == "__main__":
    main()
