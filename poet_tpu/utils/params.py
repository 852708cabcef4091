"""Parameter-tree dtype utilities for inference.

`cast_params_for_inference` keeps bf16-compute weights in bf16 *at rest*.

Why this exists: with f32 master params and `dtype=bfloat16` modules, flax
casts every kernel f32 -> bf16 inside each jitted call. XLA cannot hoist the
casts out of a serving call (and chooses not to keep both copies alive across
chained in-jit iterations), so the flagship bs=16 inference program re-converts
~25M weight elements every batch — measured 1.2 ms/batch of pure `convert` ops
on the v5e profile. Casting the affected kernels ONCE, outside the program, is
bit-identical (the module would have produced exactly the same bf16 value from
the f32 leaf) and removes that per-batch cost.

Only leaves whose consumers compute in bf16 are cast; every f32-compute island
keeps f32 params so numerics are untouched:
  * sampling_offsets / attention_weights / reference_points projections
    (MSDeformAttn's f32 coordinate path, models/transformer.py),
  * translation/rotation MLP heads (consume f32-cast decoder states,
    models/poet.py),
  * level_embed / query_embed / learned position embeddings (f32 adds),
  * the Mask R-CNN RPN + RoI heads (f32-compute, models/maskrcnn.py).

Training uses the same transform INSIDE the step (engine/train.py
make_loss_fn): master weights, grads, and the optimizer stay f32 (matching
the reference's f32 training, /root/reference/main.py has no AMP), but the
per-use casts hoist to one pass at the step top — outside the rematerialized
encoder layers, which otherwise re-convert their kernels during the backward
re-forward.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import traverse_util

# f32-compute islands inside otherwise-bf16 module trees: leaves under these
# names must keep f32 (see module docstring).
_F32_ISLANDS = (
    "sampling_offsets",
    "attention_weights",
    "reference_points",
    "level_embed",
)

# path components that mark a bf16-compute subtree (dtype=<compute dtype>
# flows into every Dense/Conv there). "detector" (r5): the Mask R-CNN RPN +
# RoI head convs/matmuls compute bf16 in bf16 configs (models/maskrcnn.py
# `dtype`; ranking arithmetic downstream stays f32 and bf16 configs are the
# only callers of this transform, so at-rest bf16 is bit-identical there).
_BF16_SUBTREES = ("fpn_body", "body", "transformer", "detector")
_BF16_PREFIXES = ("input_proj_",)


def _should_cast(path: tuple, leaf: Any) -> bool:
    if not hasattr(leaf, "dtype") or leaf.dtype != jnp.float32:
        return False
    if getattr(leaf, "ndim", 0) < 2:
        # vectors (biases, norm scales, FrozenBatchNorm stats) are cheap to
        # convert per call and several are consumed in f32 folds — skip.
        return False
    in_bf16_subtree = any(
        p in _BF16_SUBTREES or p.startswith(_BF16_PREFIXES) for p in path
    )
    if not in_bf16_subtree:
        return False
    return not any(p in _F32_ISLANDS for p in path)


def cast_params_for_inference(params, compute_dtype=jnp.bfloat16):
    """Cast bf16-compute weight matrices/kernels to `compute_dtype` at rest.

    No-op for f32 configs (pass the result to `model.apply` either way: flax's
    dtype promotion yields bit-identical outputs to the f32-at-rest tree).
    """
    if compute_dtype == jnp.float32:
        return params
    flat = traverse_util.flatten_dict(params)
    flat = {
        k: (v.astype(compute_dtype) if _should_cast(k, v) else v)
        for k, v in flat.items()
    }
    return traverse_util.unflatten_dict(flat)
