"""ZeRO-1 optimizer-state sharding over the 'data' mesh axis.

An EXTENSION beyond the reference's capabilities (the reference implements
only DDP with fully replicated optimizer state, SURVEY.md §2.3;
/root/reference/main.py:272-283). AdamW keeps two f32 moments per trainable
parameter, so replicated state costs 2x trainable-params x 4 bytes on EVERY
chip. ZeRO stage 1 shards those moments across the data-parallel axis
instead; the parameters themselves stay replicated so the forward/backward
is unchanged.

The TPU-native expression needs no optimizer rewrite and no hand-written
reduce-scatter/all-gather: the moments are just pytree leaves, so placing
them with a 'data'-sharded NamedSharding and jitting `tx.init`/`tx.update`
under the mesh makes GSPMD emit the reduce-scatter of gradients into the
moment update and the all-gather of the parameter update — the exact
collective schedule of ZeRO-1, chosen by the compiler.

Usage (see cli.main / tests/test_zero.py):

    shardings = zero1_opt_state_shardings(tx, params, mesh)
    opt_state = jax.jit(tx.init, out_shardings=shardings)(params)

The train step itself is unchanged — GSPMD propagates the input shardings
through `tx.update` and keeps the new opt state sharded.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(shape, n_data: int, base: P | None) -> P:
    """'data' on the largest axis divisible by n_data (and not already taken
    by a tensor-parallel axis in `base`); replicated if none divides."""
    base_axes = tuple(base) if base is not None else ()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        taken = base_axes[i] if i < len(base_axes) else None
        if taken is None and shape[i] % n_data == 0 and shape[i] >= n_data:
            spec = list(base_axes) + [None] * (len(shape) - len(base_axes))
            spec[i] = "data"
            return P(*spec)
    return base if base is not None else P()


def zero1_opt_state_shardings(tx, params: Any, mesh: Mesh,
                              base_shardings: Any = None) -> Any:
    """NamedSharding tree for `tx.init(params)` with moments ZeRO-1-sharded.

    Every opt-state leaf with an axis divisible by the 'data' axis size is
    sharded along that axis; scalars (step counts) and indivisible leaves
    replicate. `base_shardings` (optional, same treedef) supplies existing
    tensor-parallel specs to compose with — 'data' is then placed on a
    different axis than 'model'.
    """
    n_data = mesh.shape["data"]
    shapes = jax.eval_shape(tx.init, params)

    base_leaves = None
    if base_shardings is not None:
        base_leaves = jax.tree_util.tree_leaves(base_shardings)

    def base_spec_of(entry):
        # accept a NamedSharding, or an array whose .sharding is one (so an
        # already-placed opt state can serve directly as the base)
        if isinstance(entry, NamedSharding):
            return entry.spec
        s = getattr(entry, "sharding", None)
        return s.spec if isinstance(s, NamedSharding) else None

    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    out = []
    for i, leaf in enumerate(leaves):
        base = base_spec_of(base_leaves[i]) if base_leaves is not None else None
        if n_data == 1 or leaf.ndim == 0:
            out.append(NamedSharding(mesh, base if base is not None else P()))
        else:
            out.append(NamedSharding(mesh, _leaf_spec(leaf.shape, n_data, base)))
    return jax.tree_util.tree_unflatten(treedef, out)


def init_zero1_opt_state(tx, params: Any, mesh: Mesh,
                         base_shardings: Any = None) -> Any:
    """tx.init(params) with ZeRO-1 moment placement (jitted under the mesh)."""
    shardings = zero1_opt_state_shardings(tx, params, mesh, base_shardings)
    with jax.set_mesh(mesh):
        return jax.jit(tx.init, out_shardings=shardings)(params)


def init_zero1_opt_state_tp(tx, params_sharded: Any, mesh: Mesh) -> Any:
    """ZeRO-1 init composing with existing tensor-parallel param shardings.

    First inits under jit so the moments inherit their parameters' TP specs
    (as parallel/tp.py:shard_opt_state does), then layers 'data' onto a free
    axis of every divisible leaf and re-places. Used by the dp x sp x tp x
    ZeRO dry run (__graft_entry__.dryrun_multichip).
    """
    with jax.set_mesh(mesh):
        opt0 = jax.jit(tx.init)(params_sharded)
    shardings = zero1_opt_state_shardings(tx, params_sharded, mesh,
                                          base_shardings=opt0)
    return jax.device_put(opt0, shardings)


def opt_state_bytes_per_device(opt_state: Any) -> int:
    """Actual per-device bytes of an opt-state tree (diagnostic)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(opt_state):
        if not (hasattr(leaf, "sharding") and hasattr(leaf, "nbytes")):
            continue
        try:
            shard_elems = int(np.prod(leaf.sharding.shard_shape(leaf.shape)))
        except Exception:
            shard_elems = leaf.size
        total += shard_elems * leaf.dtype.itemsize
    return int(total)
