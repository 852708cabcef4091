"""Driver contract: entry() compiles single-chip; dryrun_multichip runs on 8."""

import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np


def test_entry_compiles():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert np.isfinite(np.asarray(out["translations"])).all()


def test_dryrun_multichip():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
