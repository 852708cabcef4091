"""ResNet-50 + FPN feature extractor (flax.linen, channels-last, frozen-BN).

TPU-native equivalent of torchvision's `resnet_fpn_backbone('resnet50')` used
by the reference detector (models/backbone_maskrcnn.py:30). Structure mirrors
torchvision exactly (bottleneck counts [3,4,6,3], FPN inner/layer 1x1+3x3
convs, LastLevelMaxPool) so torchvision checkpoints can be ported weight-for-
weight; layout is NHWC and BatchNorm is frozen (inference-mode affine) because
the reference always runs the detector frozen in eval mode
(models/backbone.py:36-40, backbone_maskrcnn.py:49-52).

Note: the reference's `MaskRCNNBackbone.forward` feeds raw [0, 1] images
straight into the FPN body, BYPASSING torchvision's GeneralizedRCNNTransform
(no ImageNet normalization, no resize) — we preserve that exactly.

Returned levels: {'0': stride 4, '1': 8, '2': 16, '3': 32, 'pool': 64}; PoET
consumes ['2', '3', 'pool'] (backbone_maskrcnn.py:37-42).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics (torchvision FrozenBatchNorm2d / eval BN).

    weight/bias/running_mean/running_var are parameters (so torch checkpoints
    map 1:1) but receive no gradient — the optimizer masks the backbone
    subtree, matching requires_grad_(False) in backbone_maskrcnn.py:49-52.

    The scale/offset fold is computed in f32 (params stay f32) and the affine
    applies in the activation dtype, so bf16 compute loses nothing on the
    statistics themselves.
    """

    features: int
    eps: float = 1e-5  # torchvision FrozenBatchNorm2d default

    def setup(self):
        self.weight = self.param("weight", nn.initializers.ones, (self.features,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,))
        self.running_mean = self.param(
            "running_mean", nn.initializers.zeros, (self.features,))
        self.running_var = self.param(
            "running_var", nn.initializers.ones, (self.features,))

    def scale_offset(self):
        """The affine fold (inv, off) in f32 — consumers that fuse the BN
        into a preceding conv's weights (the Pallas stem) read this
        instead of applying __call__."""
        inv = self.weight * jax.lax.rsqrt(self.running_var + self.eps)
        off = self.bias - self.running_mean * inv
        return inv, off

    def __call__(self, x):
        inv, off = self.scale_offset()
        return x * inv.astype(x.dtype) + off.astype(x.dtype)


def _conv(features, kernel, strides=1, name=None, dtype=jnp.float32):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(strides, strides),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=False,
        name=name,
        dtype=dtype,
        kernel_init=nn.initializers.he_normal(),
    )


class Bottleneck(nn.Module):
    width: int
    strides: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _conv(self.width, 1, name="conv1", dtype=self.dtype)(x)
        out = FrozenBatchNorm(self.width, name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.width, 3, strides=self.strides, name="conv2", dtype=self.dtype)(out)
        out = FrozenBatchNorm(self.width, name="bn2")(out)
        out = nn.relu(out)
        out = _conv(self.width * 4, 1, name="conv3", dtype=self.dtype)(out)
        out = FrozenBatchNorm(self.width * 4, name="bn3")(out)
        if self.downsample:
            identity = _conv(self.width * 4, 1, strides=self.strides,
                             name="downsample_conv", dtype=self.dtype)(x)
            identity = FrozenBatchNorm(self.width * 4, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class _StemConvParam(nn.Module):
    """Param-holder matching nn.Conv's tree (<name>/kernel) so checkpoints
    port identically whichever stem implementation runs."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.he_normal(), self.shape)


def resolve_stem_impl(stem_impl: str) -> str:
    """'auto' -> the fused Pallas stem on a TPU backend, XLA elsewhere.

    The 7x7/stride-2 3-channel stem conv is the one conv XLA lowers badly
    on TPU (1.75 ms/batch at bs=16 against ~0.3 ms of useful work; every
    reshape-based s2d rewrite re-inserts layout copies — README negative
    result). ops/conv_stem_pallas.py owns the data movement; its r4
    on-chip state is "exact but not yet faster" (bf16 A/B 2.66 vs XLA's
    in-model cost; the im2col tap moves are VPU-scatter-bound), so 'auto'
    stays on the XLA conv until the kernel wins its A/B.
    POET_STEM_IMPL overrides everything (on-chip A/Bs)."""
    import os

    env = os.environ.get("POET_STEM_IMPL")
    if env:
        return env
    if stem_impl != "auto":
        return stem_impl
    return "xla"


class ResNet50(nn.Module):
    """Returns C2..C5 feature maps (strides 4, 8, 16, 32)."""

    dtype: jnp.dtype = jnp.float32
    # 'auto' | 'xla' | 'pallas': implementation of the 7x7/2 stem conv
    # (+ frozen BN + relu, fused in the pallas path). Same params either way.
    stem_impl: str = "auto"

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        x = x.astype(self.dtype)
        stem = resolve_stem_impl(self.stem_impl)
        if stem.startswith("pallas"):       # 'pallas' | 'pallas_interpret'
            from poet_tpu.ops.conv_stem_pallas import conv_stem_pallas

            kernel = _StemConvParam((7, 7, 3, 64), name="conv1")()
            inv, off = FrozenBatchNorm(64, name="bn1").scale_offset()
            # fold the frozen BN affine into the conv: w' = w * inv, b' = off
            x = conv_stem_pallas(
                x, (kernel * inv.astype(kernel.dtype)).astype(self.dtype),
                off, stride=2, padding=((3, 3), (3, 3)), activation="relu",
                interpret=stem == "pallas_interpret")
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                        use_bias=False, dtype=self.dtype, name="conv1")(x)
            x = FrozenBatchNorm(64, name="bn1")(x)
            x = nn.relu(x)
        # torch maxpool(3, stride 2, padding 1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        widths = [64, 128, 256, 512]
        blocks = [3, 4, 6, 3]
        for stage, (w, n) in enumerate(zip(widths, blocks)):
            stride = 1 if stage == 0 else 2
            for b in range(n):
                x = Bottleneck(
                    w,
                    strides=stride if b == 0 else 1,
                    downsample=(b == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x)
            outs.append(x)
        return outs  # C2 (256ch), C3 (512), C4 (1024), C5 (2048)


class FPN(nn.Module):
    """torchvision FeaturePyramidNetwork + LastLevelMaxPool (out_channels 256).

    `levels` restricts which pyramid outputs are computed. The top-down
    pathway only flows coarse -> fine, so when PoET consumes only
    ('2', '3', 'pool') (backbone_maskrcnn.py:37-42) the stride-4/8 inner and
    3x3 layer convs are dead work — measured ~7 ms of a 40 ms bs=16 batch.
    Skipped levels simply create no params (flax compact), and checkpoint
    loads merge strict=False, so torchvision weight porting is unaffected.
    """

    out_channels: int = 256
    dtype: jnp.dtype = jnp.float32
    levels: Optional[Tuple[str, ...]] = None   # None -> all

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        n = len(feats)
        want = set(self.levels) if self.levels is not None else (
            {str(i) for i in range(n)} | {"pool"}
        )
        # coarsest numeric level we must emit (pool is subsampled from n-1)
        want_num = {int(k) for k in want if k != "pool"} | ({n - 1} if "pool" in want else set())
        finest = min(want_num)
        inners = {
            i: nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"inner_{i}")(feats[i])
            for i in range(finest, n)
        }
        # top-down pathway with nearest-neighbor upsampling
        laterals = {n - 1: inners[n - 1]}
        for i in range(n - 2, finest - 1, -1):
            up = jax.image.resize(
                laterals[i + 1],
                inners[i].shape[:1] + inners[i].shape[1:3] + laterals[i + 1].shape[3:],
                method="nearest",
            )
            laterals[i] = inners[i] + up
        outs = {
            str(i): nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, name=f"layer_{i}")(laterals[i])
            for i in range(finest, n)
            if str(i) in want or (i == n - 1 and "pool" in want)
        }
        # LastLevelMaxPool: 1x1 window, stride 2 — i.e. plain subsampling
        if "pool" in want:
            outs["pool"] = outs[str(n - 1)][:, ::2, ::2, :]
        return {k: v for k, v in outs.items() if k in want}


class ResNetFPN(nn.Module):
    """Full feature extractor: images (B, H, W, 3) in [0, 1] -> level dict.

    `dtype` is the compute dtype (params stay f32): bf16 halves conv HBM
    traffic and doubles MXU throughput; the detector is frozen at inference so
    there is no training-stability concern.
    """

    out_channels: int = 256
    dtype: jnp.dtype = jnp.float32
    levels: Optional[Tuple[str, ...]] = None   # None -> all FPN levels

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        feats = ResNet50(dtype=self.dtype, name="body")(images)
        return FPN(self.out_channels, dtype=self.dtype, levels=self.levels,
                   name="fpn")(feats)


def downsample_mask(pad_mask: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Resize a (B, H, W) bool pad mask to a feature resolution.

    Parity: F.interpolate(mask.float(), size).to(bool) at
    backbone_maskrcnn.py:118-125 (nearest-neighbor on the float mask).
    """
    m = jax.image.resize(pad_mask.astype(jnp.float32), (pad_mask.shape[0],) + tuple(hw), "nearest")
    return m.astype(bool)
