"""Checkpoint / resume (orbax).

Parity target: main.py:285-317,357-369 —
  * rolling `checkpoint` plus snapshots every save_interval epochs and before
    LR drops,
  * saved payload {params, opt_state, epoch, config-echo} (the reference
    pickles the argparse namespace; we store the config JSON),
  * resume restores params/opt state/epoch; like the reference, current CLI
    learning rates override checkpointed ones (our LR lives in the schedule,
    which is rebuilt from the CLI config — the reference needs a hack at
    main.py:299-317 for this; here it falls out of the functional design),
  * missing/unexpected parameter keys tolerated with a report (main.py:293-298).
"""

from __future__ import annotations

import os
from typing import Any, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from poet_tpu.config import PoETConfig


def _to_host(tree):
    """device_get that also handles multi-host-sharded leaves.

    With ZeRO-1 on a multi-host mesh the optimizer moments are not fully
    addressable from any single process; gather them first so the rank-0
    writer sees complete arrays (no-op on single-host / replicated trees).
    """
    def one(x):
        if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            # tiled=True: reassemble the GLOBAL array (global sharded inputs
            # reject the default stacking mode — caught by the 2-process
            # test tests/mp_worker.py, which this path previously failed)
            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return jax.device_get(x)

    return jax.tree_util.tree_map(one, tree)


def save_checkpoint(output_dir: str, name: str, state, epoch: int, cfg: PoETConfig):
    """Write {params, opt_state, epoch} under output_dir/name."""
    path = os.path.abspath(os.path.join(output_dir, name))
    ckptr = ocp.PyTreeCheckpointer()
    payload = {
        "params": _to_host(state.params),
        "opt_state": _to_host(state.opt_state),
        "step": int(state.step),
        "epoch": epoch,
    }
    ckptr.save(path, payload, force=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        f.write(cfg.to_json())


def checkpoint_paths_for_epoch(output_dir: str, epoch: int, cfg: PoETConfig):
    """Rolling + snapshot names. Parity: main.py:357-361."""
    names = ["checkpoint"]
    if (epoch + 1) % cfg.optim.lr_drop == 0 or (epoch + 1) % cfg.runtime.save_interval == 0:
        names.append(f"checkpoint{epoch:04d}")
    return names


_URL_RE = None


def fetch_checkpoint(path: str) -> str:
    """Download a `--resume` URL into the local cache, else return the path.

    Parity: the reference accepts https:// checkpoint URLs via
    torch.hub.load_state_dict_from_url (main.py:288-290). Supports
    https/http and file:// (the latter makes the path unit-testable with
    zero egress). Cached by URL hash under ~/.cache/poet_tpu/checkpoints.
    """
    import re

    global _URL_RE
    if _URL_RE is None:
        _URL_RE = re.compile(r"^(https?|file)://")
    if not _URL_RE.match(path):
        return path
    import hashlib
    import urllib.request

    cache = os.path.join(os.path.expanduser("~"), ".cache", "poet_tpu",
                         "checkpoints")
    os.makedirs(cache, exist_ok=True)
    base = os.path.basename(path.split("?", 1)[0]) or "checkpoint"
    dest = os.path.join(cache,
                        hashlib.sha1(path.encode()).hexdigest()[:16] + "_" + base)
    if not os.path.exists(dest):
        urllib.request.urlretrieve(path, dest)
    return dest


def load_resume(path: str, enc_layers: int, dec_layers: int, nheads: int,
                aleatoric: bool = False):
    """`--resume` dispatcher: orbax dir, reference .pth/.pt/.npz zoo file, or
    a URL to either file kind. Returns (payload, start_epoch).

    Zoo files carry parameters only (no optimizer state), matching what a
    reference model-zoo resume restores (main.py:288-298); training then
    starts at epoch 0 with fresh optimizer state.
    """
    local = fetch_checkpoint(path)
    if os.path.isfile(local) and local.endswith((".pth", ".pt", ".npz")):
        from poet_tpu.utils.torch_import import (
            assemble_poet_params,
            load_state_dict_file,
        )

        sd = load_state_dict_file(local)
        tree = assemble_poet_params(sd, enc_layers, dec_layers, nheads,
                                    aleatoric)
        return {"params": {"params": tree}}, 0
    return load_checkpoint(local)


def load_checkpoint(path: str, template=None):
    """Restore a checkpoint; returns (payload, start_epoch).

    With `template` (a payload-shaped pytree, e.g. from a freshly built
    TrainState), orbax restores into the exact structure — required for the
    optimizer state whose pytree contains namedtuples.
    """
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        payload = ckptr.restore(path, item=template)
    else:
        payload = ckptr.restore(path)
    return payload, int(payload.get("epoch", -1)) + 1


def merge_params(target: Any, restored: Any, prefix: str = "") -> Tuple[Any, list, list]:
    """Merge restored params into a target tree by key, strict=False.

    Returns (merged, missing_keys, unexpected_keys). Parity with torch
    load_state_dict(strict=False) reporting (main.py:293-298).
    """
    missing, unexpected = [], []

    def walk(t, r, pfx):
        if isinstance(t, dict) and isinstance(r, dict):
            out = {}
            for k in t:
                if k in r:
                    out[k] = walk(t[k], r[k], f"{pfx}{k}.")
                else:
                    missing.append(pfx + k)
                    out[k] = t[k]
            for k in r:
                if k not in t:
                    unexpected.append(pfx + k)
            return out
        if isinstance(t, dict) != isinstance(r, dict):
            missing.append(pfx.rstrip("."))
            return t
        if hasattr(t, "shape") and hasattr(r, "shape") and tuple(t.shape) != tuple(np.shape(r)):
            missing.append(pfx.rstrip(".") + f" (shape {np.shape(r)} != {tuple(t.shape)})")
            return t
        return r

    merged = walk(target, restored, prefix)
    return merged, missing, unexpected
