"""Host-side image transforms (PIL) — augmentation parameters match the
reference `data_utils/transforms.py:241-362` exactly.

Design: transforms run in the input pipeline workers on HOST (CPU), produce
numpy HWC float32 images in [0, 1]; nothing here touches the device. The
reference's `Normalize` is an identity on pixels (mean 0 / std 1,
pose_dataset.py:266-276) but converts boxes xyxy -> cxcywh normalized —
preserved here. Randomness is explicit (numpy Generator) instead of the
global `random` module, so the pipeline is seedable per (epoch, index).
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter, ImageOps


def to_pil(img):
    """Lazy ndarray -> PIL promotion.

    The native decoder (poet_tpu.native.imagepipe) hands the pipeline uint8
    HWC arrays; PIL objects are only materialized when a PIL-backed transform
    actually fires (each has p <= 0.3), so the common path stays PIL-free.
    """
    if isinstance(img, np.ndarray):
        return Image.fromarray(img)
    return img


def image_hw(img):
    """(height, width) for either a PIL image or an HWC ndarray."""
    if isinstance(img, np.ndarray):
        return int(img.shape[0]), int(img.shape[1])
    w, h = img.size
    return h, w


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, img, target, rng):
        for t in self.transforms:
            img, target = t(img, target, rng)
        return img, target


class RGBAugmentation:
    """Parity: transforms.py:241-254."""

    def __init__(self, function, p=0.5, factor_range=(0, 1)):
        self.function = function
        self.p = p
        self.factor_range = factor_range

    def __call__(self, img, target, rng):
        if rng.random() < self.p:
            factor = rng.uniform(*self.factor_range)
            return self.function(to_pil(img)).enhance(factor=factor), target
        return img, target


class Color(RGBAugmentation):
    def __init__(self, p=0.2, factor_range=(0.0, 20.0)):
        super().__init__(ImageEnhance.Color, p, factor_range)


class Contrast(RGBAugmentation):
    def __init__(self, p=0.2, factor_range=(0.2, 25.0)):
        super().__init__(ImageEnhance.Contrast, p, factor_range)


class Brightness(RGBAugmentation):
    def __init__(self, p=0.2, factor_range=(0.1, 6.0)):
        super().__init__(ImageEnhance.Brightness, p, factor_range)


class Sharpness(RGBAugmentation):
    def __init__(self, p=0.2, factor_range=(0.0, 50.0)):
        super().__init__(ImageEnhance.Sharpness, p, factor_range)


class Blur:
    """Gaussian blur with integer radius in [1, 3]. Parity: transforms.py:301-311."""

    def __init__(self, p=0.3, factor_range=(1, 3)):
        self.p = p
        self.factor_range = factor_range

    def __call__(self, img, target, rng):
        if rng.random() < self.p:
            radius = int(rng.integers(self.factor_range[0], self.factor_range[1] + 1))
            return to_pil(img).filter(ImageFilter.GaussianBlur(radius=radius)), target
        return img, target


class GrayScale:
    """Parity: transforms.py:257-267 (p=0.15; image re-expanded to 3 channels
    at array conversion, replacing To3DImage)."""

    def __init__(self, p=0.15):
        self.p = p

    def __call__(self, img, target, rng):
        if rng.random() < self.p:
            return ImageOps.grayscale(to_pil(img)), target
        return img, target


class ToArray:
    """PIL -> float32 HWC numpy in [0, 1] (channels-LAST for TPU), grayscale
    re-expanded to 3 channels (reference ToTensor + To3DImage)."""

    def __call__(self, img, target, rng):
        arr = np.asarray(img)
        if arr.dtype != np.float32:
            arr = arr.astype(np.float32) / 255.0
        if arr.ndim == 2:
            arr = np.repeat(arr[:, :, None], 3, axis=2)
        return arr, target


class Normalize:
    """Identity pixel normalization + box xyxy -> cxcywh normalized.

    Parity: transforms.py:328-344 with mean 0 / std 1 (pose_dataset.py:270,275).
    """

    def __call__(self, img, target, rng):
        if target is None:
            return img, None
        target = dict(target)
        h, w = img.shape[0], img.shape[1]
        if "boxes" in target and len(target["boxes"]):
            b = np.asarray(target["boxes"], dtype=np.float32)
            cxcywh = np.stack(
                [(b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2,
                 b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], axis=1,
            )
            target["boxes"] = cxcywh / np.array([w, h, w, h], dtype=np.float32)
        return img, target


def make_pose_estimation_transform(image_set: str, use_rgb_augmentation=False,
                                   use_grayscale=False) -> Compose:
    """Split-dependent pipeline. Parity: pose_dataset.py:259-317 (grayscale is
    skipped for test-like splits)."""
    steps = []
    if image_set in ("train", "train_synt", "train_pbr") and use_rgb_augmentation:
        steps += [Blur(), Sharpness(), Contrast(), Brightness(), Color()]
    if use_grayscale and image_set not in ("keyframes", "keyframes_bop", "test"):
        steps.append(GrayScale())
    steps += [ToArray(), Normalize()]
    return Compose(steps)


def jitter_boxes(boxes_cxcywh: np.ndarray, rng, probability=0.5, std=0.02) -> np.ndarray:
    """Truncated-normal center jitter + uniform-ish w/h scale.

    Parity: pose_dataset.py:69-87 — per box with `probability`: cx/cy drawn
    from truncnorm limited to ±w/2 (resp. ±h/2), w/h scaled by
    (1 + truncnorm(±0.3)).
    """
    from scipy.stats import truncnorm

    out = boxes_cxcywh.copy()
    for box in out:
        if rng.random() < probability:
            cxa, cxb = -box[2] / (2 * std), box[2] / (2 * std)
            cya, cyb = -box[3] / (2 * std), box[3] / (2 * std)
            wa, wb = -0.3 / std, 0.3 / std
            ha, hb = -0.3 / std, 0.3 / std
            box[0] = truncnorm.rvs(cxa, cxb, loc=box[0], scale=std, random_state=rng)
            box[1] = truncnorm.rvs(cya, cyb, loc=box[1], scale=std, random_state=rng)
            box[2] = box[2] * (1 + truncnorm.rvs(wa, wb, loc=0, scale=std, random_state=rng))
            box[3] = box[3] * (1 + truncnorm.rvs(ha, hb, loc=0, scale=std, random_state=rng))
    return out
