"""Tensor parallelism over attention heads — 2-D ('data', 'model') mesh.

An EXTENSION beyond the reference's capabilities (the reference implements
only DDP data parallelism, SURVEY.md §2.3; /root/reference/main.py:280-283).
The natural tensor axis of PoET is the attention-head axis: the deformable
sampling core is embarrassingly parallel over heads (every einsum in
poet_tpu.ops.deform_attn has `h` as a batch dimension), so a Megatron-style
column/row split of the projections shards the whole encoder/decoder with
exactly ONE all-reduce per attention block and one per FFN:

  column-parallel (output dim = heads-major, sharded over 'model'):
    value_proj, sampling_offsets, attention_weights, linear1,
    decoder MHA query/key/value
  row-parallel (input dim sharded, GSPMD inserts the psum):
    output_proj, linear2, decoder MHA out

Everything else (backbone, heads, norms, embeddings) is replicated; the
batch is sharded over 'data'. No module code changes: the split is expressed
purely as parameter PartitionSpecs and propagated by GSPMD — the idiomatic
JAX equivalent of Megatron's ColumnParallelLinear/RowParallelLinear classes.

Requires cfg.model.nheads % n_model == 0 (16 heads at the paper config
shards over 2/4/8 devices).
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh_2d(n_data: int = -1, n_model: int = 1, devices=None) -> Mesh:
    """('data', 'model') mesh. n_data = -1 -> all remaining devices.

    The 'model' axis is placed minor (fastest-varying over the device list)
    so tensor-parallel collectives ride neighboring ICI links.
    """
    devices = devices if devices is not None else jax.devices()
    if n_data == -1:
        n_data = len(devices) // n_model
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def create_mesh_3d(n_data: int = -1, n_seq: int = 1, n_model: int = 1,
                   devices=None) -> Mesh:
    """('data', 'seq', 'model') mesh: dp x sp x tp.

    'seq' shards the encoder's flattened multi-scale token axis (see
    parallel/tp.py:shard_tokens / models/transformer.py) — the natural
    long-sequence axis of PoET per SURVEY.md §5. Axis order keeps the
    chattier axes minor (neighboring ICI links).
    """
    devices = devices if devices is not None else jax.devices()
    if n_data == -1:
        n_data = len(devices) // (n_seq * n_model)
    grid = np.asarray(devices[: n_data * n_seq * n_model]).reshape(
        n_data, n_seq, n_model
    )
    return Mesh(grid, axis_names=("data", "seq", "model"))


def shard_tokens(x, token_axis: int = 1):
    """Constrain a (B, S, ...) activation to shard its token axis over 'seq'.

    SEQUENCE PARALLELISM for the encoder: tokens split across 'seq'; the
    deformable sampling core reads the full per-level value maps, so GSPMD
    inserts one all-gather of the (small) value tensor per attention block
    while the FFN/LayerNorm token math stays fully parallel — the same
    communication shape as all-gather-KV sequence-parallel attention.

    No-op unless called under `jax.set_mesh` with a 'seq' axis, so single-
    device and dp/tp-only configurations are unaffected.
    """
    try:
        mesh = jax.sharding.get_abstract_mesh()
        axes = set(mesh.axis_names) if mesh is not None else set()
    except Exception:
        axes = set()
    if "seq" not in axes:
        return x
    spec = [None] * x.ndim
    if "data" in axes:
        spec[0] = "data"
    spec[token_axis] = "seq"
    return jax.lax.with_sharding_constraint(x, P(*spec))


# (path regex, spec) — first match wins; kernels are (in, out) matrices
# except flax MHA which uses (C, H, hd) / (H, hd, C).
_TP_RULES = (
    # deformable attention: head-major output dims -> column parallel
    (r"(value_proj|sampling_offsets|attention_weights)/kernel", P(None, "model")),
    (r"(value_proj|sampling_offsets|attention_weights)/bias", P("model")),
    (r"output_proj/kernel", P("model", None)),          # row parallel
    (r"output_proj/bias", P()),
    # FFN
    (r"linear1/kernel", P(None, "model")),
    (r"linear1/bias", P("model")),
    (r"linear2/kernel", P("model", None)),
    (r"linear2/bias", P()),
    # decoder MHA (flax MultiHeadDotProductAttention): (C, H, hd) and (H, hd, C)
    (r"self_attn/(query|key|value)/kernel", P(None, "model", None)),
    (r"self_attn/(query|key|value)/bias", P("model", None)),
    (r"self_attn/out/kernel", P("model", None, None)),
    (r"self_attn/out/bias", P()),
)


def param_spec(path: str) -> P:
    """PartitionSpec for one parameter path ('a/b/c' form)."""
    for pat, spec in _TP_RULES:
        if re.search(pat, path):
            return spec
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Tree of NamedShardings implementing head tensor parallelism.

    With a 1-sized (or absent) 'model' axis every spec degrades to
    replication, so this is safe to use unconditionally.
    """

    axis_names = set(mesh.axis_names)

    def one(path, leaf):
        p = "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path
        )
        spec = param_spec(p)
        # replicate axes the mesh doesn't define (1-D data mesh -> pure DP)
        spec = P(*(a if a in axis_names else None for a in spec))
        # drop axes the leaf doesn't have (bias rules vs scalar leaves)
        if len(spec) > leaf.ndim:
            spec = P(*spec[: leaf.ndim])
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a replicated/host param tree onto the mesh with TP shardings."""
    return jax.device_put(params, param_shardings(params, mesh))


def shard_opt_state(tx, params_sharded: Any):
    """Init optimizer state under jit so its leaves inherit the param
    shardings (adamw moments follow their parameters; scalars replicate)."""
    return jax.jit(tx.init)(params_sharded)
