"""Pose-estimation dataset: COCO-style JSON + images -> padded numpy targets.

Parity targets:
  * data_utils/torchvision_datasets/coco.py (plain-JSON instead of
    pycocotools — same annotation schema; in-RAM byte cache sharded by
    local rank; RGBA 'synt' images composited onto random backgrounds),
  * data_utils/pose_dataset.py (ProcessPoseData: box xywh->xyxy clamp,
    degenerate-box filter, relative pose + auto-derived quaternions,
    per-object intrinsics; split->path map; bbox jitter).

TPU-native difference: __getitem__ returns numpy + a per-image target dict;
batch assembly (pad to num_queries) happens in poet_tpu.data.loader.
"""

from __future__ import annotations

import json
import os
from io import BytesIO
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from poet_tpu.data.transforms import (
    Compose,
    image_hw,
    jitter_boxes,
    make_pose_estimation_transform,
)


_NATIVE = None


def _native_imagepipe():
    """The C++ decode library (poet_tpu/native/imagepipe.cpp), or None.

    Probed once per process; falls back to PIL when the toolchain or
    libpng/libjpeg are unavailable, or when POET_TPU_DISABLE_NATIVE_DECODE
    is set (used by the parity tests to force the PIL path)."""
    global _NATIVE
    if os.environ.get("POET_TPU_DISABLE_NATIVE_DECODE"):
        return None
    if _NATIVE is None:
        try:
            from poet_tpu import native
            _NATIVE = native if native.imagepipe_available() else False
        except Exception:
            _NATIVE = False
    return _NATIVE or None
# HOST-ONLY conversions: the loader workers must never dispatch JAX ops —
# an eager jnp call per image is a device roundtrip (through the TPU tunnel
# in production: measured 367 ms/image vs ~0.1 ms for the numpy twins).
from poet_tpu.utils.quaternions import quat2rot_np as _quat2rot_np
from poet_tpu.utils.quaternions import rot2quat_np as _rot2quat_np


def load_image_rgb_f32(path: str) -> np.ndarray:
    """Decode one image file to (H, W, 3) float32 [0,1] — native C++ decode
    when available, PIL fallback. Shared by the inference/serving paths."""
    with open(path, "rb") as f:
        blob = f.read()
    native = _native_imagepipe()
    if native is not None:
        try:
            return native.decode_image(blob).astype(np.float32) / 255.0
        except ValueError:
            pass
    img = Image.open(BytesIO(blob)).convert("RGB")
    return np.asarray(img, dtype=np.float32) / 255.0


class PoseDataset:
    """COCO-style 6D pose dataset.

    Args mirror data_utils/pose_dataset.py:39-59.
    """

    def __init__(
        self,
        img_folder: str,
        ann_file: str,
        synthetic_background: Optional[str] = None,
        transforms: Optional[Compose] = None,
        jitter: bool = False,
        jitter_probability: float = 0.5,
        jitter_std: float = 0.02,
        cache_mode: bool = False,
        decoded_cache_mb: int = 0,
        local_rank: int = 0,
        local_size: int = 1,
    ):
        self.root = str(img_folder)
        with open(ann_file) as f:
            coco = json.load(f)
        self.images: Dict[int, dict] = {img["id"]: img for img in coco["images"]}
        self.anns_by_image: Dict[int, List[dict]] = {i: [] for i in self.images}
        for ann in coco["annotations"]:
            if ann["image_id"] in self.anns_by_image:
                self.anns_by_image[ann["image_id"]].append(ann)
        self.categories = coco.get("categories", [])
        self.ids = sorted(self.images.keys())
        self._transforms = transforms
        self.jitter = jitter
        self.jitter_probability = jitter_probability
        self.jitter_std = jitter_std
        self.has_intrinsics = bool(self.images) and "intrinsics" in next(iter(self.images.values()))

        self.cache_mode = cache_mode
        self.local_rank = local_rank
        self.local_size = local_size
        self.cache: Dict[str, bytes] = {}
        if cache_mode:
            self._cache_images()

        # Decoded-image cache (extension beyond the reference's byte cache,
        # coco.py:66-73): training decodes every PNG once per EPOCH (~8.5 ms
        # host CPU each, inflate-bound); caching the decoded uint8 pixels
        # makes epochs 2+ decode-free up to the byte budget. Filled on first
        # decode, no eviction (epoch reuse is uniform, so a prefix cache
        # equals LRU without the churn). Arrays are stored read-only; every
        # consumer copies on write (PIL fromarray, np ops).
        self._decoded_cache: Dict[tuple, np.ndarray] = {}
        self._decoded_budget = int(decoded_cache_mb) * (1 << 20)
        self._decoded_bytes = 0

        if synthetic_background is not None:
            self.synthetic_background = [
                os.path.join(synthetic_background, f)
                for f in os.listdir(synthetic_background)
                if os.path.isfile(os.path.join(synthetic_background, f))
            ]
        else:
            self.synthetic_background = None

    # ------------------------------------------------------------------
    def __len__(self):
        return len(self.ids)

    def file_name(self, image_id: int) -> str:
        return self.images[image_id]["file_name"]

    def _cache_images(self):
        """In-RAM byte cache sharded by local rank (coco.py:66-73)."""
        for index, img_id in enumerate(self.ids):
            if index % self.local_size != self.local_rank:
                continue
            path = self.images[img_id]["file_name"]
            with open(os.path.join(self.root, path), "rb") as f:
                self.cache[path] = f.read()

    def _get_blob(self, path: str) -> bytes:
        if self.cache_mode:
            if path not in self.cache:
                with open(os.path.join(self.root, path), "rb") as f:
                    self.cache[path] = f.read()
            return self.cache[path]
        with open(os.path.join(self.root, path), "rb") as f:
            return f.read()

    def _get_image(self, path: str, mode: str = "RGB"):
        """Decode one image: native C++ (libpng/libjpeg, GIL-free) when
        available — RGB images stay uint8 ndarrays and only become PIL
        objects if a PIL transform fires (transforms.to_pil); RGBA (synthetic
        compositing) returns PIL since paste() needs it."""
        key = (path, mode)
        arr = self._decoded_cache.get(key)
        if arr is None:
            blob = self._get_blob(path)
            native = _native_imagepipe()
            if native is not None:
                try:
                    arr = native.decode_image(blob, 4 if mode == "RGBA" else 3)
                except ValueError:
                    pass  # unknown/corrupt format: let PIL try
            if arr is None:
                arr = np.asarray(Image.open(BytesIO(blob)).convert(mode))
            if self._decoded_bytes + arr.nbytes <= self._decoded_budget:
                arr.setflags(write=False)
                # dict assignment is GIL-atomic; a racing worker at worst
                # decodes the same image twice and the budget overshoots by
                # one image
                self._decoded_cache[key] = arr
                self._decoded_bytes += arr.nbytes
        return Image.fromarray(arr, "RGBA") if mode == "RGBA" else arr

    def _get_background(self, target_size, rng) -> Image.Image:
        """Random flip/crop/resize background (coco.py:83-104)."""
        path = self.synthetic_background[int(rng.integers(0, len(self.synthetic_background)))]
        arr = self._decoded_cache.get((path, "BG"))
        if arr is not None:
            bg = Image.fromarray(arr)
        else:
            bg = Image.open(path).convert("RGB")
            if self._decoded_budget:
                arr = np.asarray(bg)
                if self._decoded_bytes + arr.nbytes <= self._decoded_budget:
                    arr.setflags(write=False)
                    self._decoded_cache[(path, "BG")] = arr
                    self._decoded_bytes += arr.nbytes
        w, h = bg.size
        if rng.random() < 0.5:
            bg = bg.transpose(Image.FLIP_TOP_BOTTOM)
        elif rng.random() < 0.5:
            bg = bg.transpose(Image.FLIP_LEFT_RIGHT)
        if rng.random() < 0.5:
            left = int(rng.integers(0, w + 1))
            top = int(rng.integers(0, h + 1))
            right = int(rng.integers(left, w + 1))
            bottom = int(rng.integers(top, h + 1))
            bg = bg.crop((left, top, right, bottom))
        return bg.resize(target_size)

    # ------------------------------------------------------------------
    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        img_id = self.ids[idx]
        info = self.images[img_id]
        anno = [a for a in self.anns_by_image[img_id] if a.get("iscrowd", 0) == 0]

        synthetic = info.get("type") == "synt"
        img = self._get_image(info["file_name"], "RGBA" if synthetic else "RGB")
        if synthetic:
            if self.synthetic_background is None:
                img = img.convert("RGB")
            else:
                bg = self._get_background(img.size, rng)
                bg.paste(img, (0, 0), img)
                img = bg

        target = self._process(img, anno, img_id, info)
        if self._transforms is not None:
            img, target = self._transforms(img, target, rng)

        if self.jitter:
            target["jitter_boxes"] = jitter_boxes(
                np.asarray(target["boxes"], np.float32),
                rng, self.jitter_probability, self.jitter_std,
            )
        return img, target

    def _process(self, image, anno, image_id, info):
        """ProcessPoseData parity (pose_dataset.py:109-256)."""
        h, w = image_hw(image)
        boxes = np.asarray([a["bbox"] for a in anno], np.float32).reshape(-1, 4)
        boxes[:, 2:] += boxes[:, :2]                       # xywh -> xyxy
        boxes[:, 0::2] = boxes[:, 0::2].clip(0, w)
        boxes[:, 1::2] = boxes[:, 1::2].clip(0, h)
        classes = np.asarray([a["category_id"] for a in anno], np.int64)

        rel_position = rel_rotation = rel_quaternion = None
        if anno and "relative_pose" in anno[0]:
            rp = anno[0]["relative_pose"]
            if "position" in rp:
                rel_position = np.asarray(
                    [a["relative_pose"]["position"] for a in anno], np.float32
                )
            if "rotation" in rp:
                rel_rotation = np.asarray(
                    [a["relative_pose"]["rotation"] for a in anno], np.float32
                ).reshape(-1, 3, 3)
                rel_quaternion = _rot2quat_np(rel_rotation).astype(np.float32)
            elif "quaternions" in rp:
                rel_quaternion = np.asarray(
                    [a["relative_pose"]["quaternions"] for a in anno], np.float32
                )
                rel_rotation = _quat2rot_np(rel_quaternion).astype(np.float32)

        intrinsics = None
        if anno and "intrinsics" in anno[0]:
            intrinsics = np.asarray([a["intrinsics"] for a in anno], np.float32)
        elif "intrinsics" in info and anno:
            intrinsics = np.tile(
                np.asarray(info["intrinsics"], np.float32)[None], (len(anno), 1)
            )

        # degenerate-box filter (pose_dataset.py:202-220)
        keep = (boxes[:, 3] > boxes[:, 1]) & (boxes[:, 2] > boxes[:, 0])
        target = {
            "boxes": boxes[keep],
            "labels": classes[keep],
            "image_id": image_id,
            "orig_size": np.asarray([int(h), int(w)]),
        }
        if rel_position is not None:
            target["relative_position"] = rel_position[keep]
        if rel_rotation is not None:
            target["relative_rotation"] = rel_rotation[keep]
        if rel_quaternion is not None:
            target["relative_quaternions"] = rel_quaternion[keep]
        if intrinsics is not None:
            target["intrinsics"] = intrinsics[keep]
        return target


def build_dataset(image_set: str, cfg, local_rank: int = 0, local_size: int = 1) -> PoseDataset:
    """Split -> (image dir, annotation file) map. Parity: pose_dataset.py:320-345."""
    root = Path(cfg.data.dataset_path)
    assert root.exists(), f"dataset path {root} does not exist"
    paths = {
        "train": (root / "train", root / "annotations" / "train.json"),
        "train_synt": (root / "train", root / "annotations" / "train_synt.json"),
        "train_pbr": (root / "train", root / "annotations" / "train_pbr.json"),
        "test": (root / "test_all", root / "annotations" / "test.json"),
        "keyframes": (root / "test_all", root / "annotations" / "keyframes.json"),
        "keyframes_bop": (root / "test_all", root / "annotations" / "keyframes_bop.json"),
        "val": (root / "val", root / "annotations" / "val.json"),
    }
    img_folder, ann_file = paths[image_set]
    return PoseDataset(
        str(img_folder),
        str(ann_file),
        synthetic_background=cfg.data.synt_background,
        transforms=make_pose_estimation_transform(
            image_set, cfg.data.rgb_augmentation, cfg.data.grayscale
        ),
        jitter=(cfg.model.bbox_mode == "jitter"),
        jitter_probability=cfg.data.jitter_probability,
        cache_mode=cfg.data.cache_mode,
        decoded_cache_mb=cfg.data.decoded_cache_mb,
        local_rank=local_rank,
        local_size=local_size,
    )
