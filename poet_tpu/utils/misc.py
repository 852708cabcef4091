"""Misc runtime utilities.

Parity targets from util/misc.py that survive the TPU re-design: the git
state stamp (:288-305), inverse_sigmoid (:520-524), rank gating helpers
(:374-427 — now jax.process_index based). NestedTensor and the NCCL
collectives deliberately have NO equivalent (static shapes / compiler
collectives).
"""

from __future__ import annotations

import os
import subprocess

import jax
import jax.numpy as jnp


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Parity: util/misc.py:520-524."""
    x = jnp.clip(x, 0, 1)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1 - x, eps, None)
    return jnp.log(x1 / x2)


def get_sha() -> str:
    """Git state stamp. Parity: util/misc.py:288-305."""
    cwd = os.path.dirname(os.path.abspath(__file__))

    def _run(cmd):
        return subprocess.check_output(cmd, cwd=cwd).decode("ascii").strip()

    sha, diff, branch = "N/A", "clean", "N/A"
    try:
        sha = _run(["git", "rev-parse", "HEAD"])
        subprocess.check_output(["git", "diff"], cwd=cwd)
        diff = _run(["git", "diff-index", "HEAD"])
        diff = "has uncommitted changes" if diff else "clean"
        branch = _run(["git", "rev-parse", "--abbrev-ref", "HEAD"])
    except Exception:
        pass
    return f"sha: {sha}, status: {diff}, branch: {branch}"


def is_main_process() -> bool:
    """Parity: util/misc.py:417-422 (rank 0 -> process_index 0)."""
    return jax.process_index() == 0


def save_on_master(save_fn, *args, **kwargs):
    """Parity: util/misc.py:425-427."""
    if is_main_process():
        return save_fn(*args, **kwargs)
    return None
