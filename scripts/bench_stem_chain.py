"""In-context A/B of the CSP stem chain (the YOLO profile's top non-kernel
cost). bench_stem_fold.py showed the two stride-2 convs run 2.8/0.57 ms
STANDALONE vs 5.7/2.8 ms in-model — the overhead is layout interaction with
the surrounding graph, not the conv schedule itself. This script rebuilds
the exact stem sequence (conv0 3->32 s1, conv1 32->64 s2, conv2 64->32 1x1,
conv3 32->64 3x3, shortcut, conv4 64->128 s2, all with mish) and A/Bs
whole-chain timings under structural variants to find which neighbor forces
the bad layout.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_stem_chain.py [variant...]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import _marginal_loop  # noqa: E402
from poet_tpu.models.yolov4 import mish  # noqa: E402


def conv(x, k, stride=1):
    pad = (k.shape[0] // 2, k.shape[0] // 2)
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(stride, stride), padding=[pad, pad],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def make_kernels(rng, dtype):
    shapes = [(3, 3, 3, 32), (3, 3, 32, 64), (1, 1, 64, 32),
              (3, 3, 32, 64), (3, 3, 64, 128)]
    return [jnp.asarray(rng.standard_normal(s) * 0.05, dtype) for s in shapes]


def chain_plain(x, ks, barrier=False, act=mish):
    def b(t):
        return jax.lax.optimization_barrier(t) if barrier else t

    y0 = b(act(conv(x, ks[0])))                 # 3->32 @480x640
    y1 = b(act(conv(y0, ks[1], 2)))             # 32->64 @240x320
    y2 = b(act(conv(y1, ks[2])))                # 64->32 1x1
    y3 = b(act(conv(y2, ks[3])))                # 32->64 3x3
    y4 = y3 + y1                                # shortcut
    y5 = b(act(conv(y4, ks[4], 2)))             # 64->128 @120x160
    return y5


def conv_nchw(x, k, stride=1):
    pad = (k.shape[0] // 2, k.shape[0] // 2)
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(stride, stride), padding=[pad, pad],
        dimension_numbers=("NCHW", "HWIO", "NCHW"))


def chain_nchw(x, ks):
    """Same chain expressed channels-first (one transpose in/out)."""
    t = x.transpose(0, 3, 1, 2)
    y0 = mish(conv_nchw(t, ks[0]))
    y1 = mish(conv_nchw(y0, ks[1], 2))
    y2 = mish(conv_nchw(y1, ks[2]))
    y3 = mish(conv_nchw(y2, ks[3]))
    y4 = y3 + y1
    y5 = mish(conv_nchw(y4, ks[4], 2))
    return y5.transpose(0, 2, 3, 1)


def subchain(x, ks, n):
    y = x
    strides = [1, 2, 1, 1, 2]
    for i in range(n):
        y = mish(conv(y, ks[i], strides[i]))
    return y


VARIANTS = {
    # the model context as-is
    "plain": lambda x, ks: chain_plain(x, ks),
    # opt barriers: stop cross-conv fusion/layout propagation
    "barrier": lambda x, ks: chain_plain(x, ks, barrier=True),
    # no mish: is the activation's where what flips the layout?
    "nomish": lambda x, ks: chain_plain(x, ks, act=lambda t: t),
    # relu instead (compare-select without the divide chain)
    "relu": lambda x, ks: chain_plain(x, ks, act=jax.nn.relu),
    # channels-first expression of the identical math
    "nchw": chain_nchw,
    # prefix subchains to localize which link adds the overhead
    "c0": lambda x, ks: subchain(x, ks, 1),
    "c01": lambda x, ks: subchain(x, ks, 2),
    "c012": lambda x, ks: subchain(x, ks, 3),
}


def main():
    rng = np.random.default_rng(0)
    which = sys.argv[1:] or list(VARIANTS)
    x = jnp.asarray(rng.uniform(size=(16, 480, 640, 3)), jnp.bfloat16)
    ks = make_kernels(rng, jnp.bfloat16)
    for name in which:
        fn = VARIANTS[name]

        def make_loop(n, fn=fn):
            @jax.jit
            def loop(x, ks, salt):
                def body(i, c):
                    y = fn(x + (c * 1e-9 + salt).astype(x.dtype), ks)
                    return jnp.sum(y[0, -1, -1].astype(jnp.float32))
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
            return lambda s: float(loop(x, ks, jnp.float32(s)))

        dt = _marginal_loop(make_loop, n=8, reps=3, max_reps=8)
        print(f"  {name:10s} {dt*1e3:7.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
