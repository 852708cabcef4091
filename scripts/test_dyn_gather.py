"""Feasibility: tpu.dynamic_gather via jnp.take_along_axis inside Pallas."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(table_ref, idx_ref, out_ref):
    table = table_ref[:]                      # (R, 128) f32
    idx = idx_ref[:]                          # (R, 128) int32
    out_ref[:] = jnp.take_along_axis(table, idx, axis=0)


def main():
    R = 512
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(R, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, R, size=(R, 128)), jnp.int32)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx)
    ref = np.take_along_axis(np.asarray(table), np.asarray(idx), axis=0)
    np.testing.assert_allclose(np.asarray(out), ref)
    print("dynamic_gather axis=0 same-shape: OK")

    # mismatched rows (idx shorter than table) — expected to fail per lowering
    idx2 = jnp.asarray(rng.integers(0, R, size=(64, 128)), jnp.int32)
    try:
        out2 = pl.pallas_call(
            lambda t, i, o: o.__setitem__(slice(None), jnp.take_along_axis(t[:], i[:], axis=0)),
            out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx2)
        ref2 = np.take_along_axis(np.asarray(table), np.asarray(idx2), axis=0)
        np.testing.assert_allclose(np.asarray(out2), ref2)
        print("mismatched-rows gather: OK (!)")
    except Exception as e:
        print(f"mismatched-rows gather: FAILS ({type(e).__name__}: {str(e)[:120]})")

    # bf16 table
    try:
        out3 = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table.astype(jnp.bfloat16), idx)
        ref3 = np.take_along_axis(np.asarray(table, np.float32).astype(jnp.bfloat16), np.asarray(idx), axis=0)
        np.testing.assert_allclose(np.asarray(out3), np.asarray(ref3))
        print("bf16 gather: OK")
    except Exception as e:
        print(f"bf16 gather: FAILS ({type(e).__name__}: {str(e)[:120]})")

    # big table (4800 rows, like encoder level 0)
    R2 = 4800
    table4 = jnp.asarray(rng.normal(size=(R2, 128)), jnp.float32)
    idx4 = jnp.asarray(rng.integers(0, R2, size=(R2, 128)), jnp.int32)
    out4 = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R2, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table4, idx4)
    ref4 = np.take_along_axis(np.asarray(table4), np.asarray(idx4), axis=0)
    np.testing.assert_allclose(np.asarray(out4), ref4)
    print("4800-row gather: OK")


if __name__ == "__main__":
    main()
