"""Shared test helpers: synthetic PoET-format dataset generation."""

import json
import os
import struct

import numpy as np
from PIL import Image


def rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def make_synthetic_dataset(root, n_train=8, n_test=4, H=96, W=128, seed=0,
                           learnable=False):
    """PoET-format dataset (images + annotations + evaluator files).

    learnable=True makes pose a deterministic function of the box so training
    can actually reduce the losses.
    """
    rng = np.random.default_rng(seed)
    classes = {"1": "obj_a", "2": "obj_b", "3": "obj_c"}
    os.makedirs(f"{root}/annotations", exist_ok=True)
    os.makedirs(f"{root}/models_eval", exist_ok=True)

    def make_split(split, n, img_dir):
        os.makedirs(f"{root}/{img_dir}/000001/rgb", exist_ok=True)
        images, annotations = [], []
        ann_id = 0
        for i in range(n):
            arr = (rng.uniform(size=(H, W, 3)) * 255).astype(np.uint8)
            fname = f"000001/rgb/{i:06d}.png"
            Image.fromarray(arr).save(f"{root}/{img_dir}/{fname}")
            images.append({"id": i, "file_name": fname, "width": W, "height": H,
                           "intrinsics": [100.0, 0, W / 2, 0, 100.0, H / 2, 0, 0, 1],
                           "type": "real"})
            for _ in range(int(rng.integers(1, 4))):
                x = float(rng.uniform(5, W - 40))
                y = float(rng.uniform(5, H - 40))
                w = float(rng.uniform(10, 30))
                h = float(rng.uniform(10, 30))
                if learnable:
                    cx, cy = (x + w / 2) / W, (y + h / 2) / H
                    t = [cx - 0.5, cy - 0.5, 0.5 + w / W]
                    R = rot_z(2 * cx - 1)
                else:
                    t = (rng.uniform(-0.2, 0.2, 3) + [0, 0, 0.8]).tolist()
                    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
                    q *= np.sign(np.diag(r))
                    if np.linalg.det(q) < 0:
                        q[:, 0] *= -1
                    R = q
                annotations.append({
                    "id": ann_id, "image_id": i, "bbox": [x, y, w, h],
                    "area": w * h, "iscrowd": 0,
                    "category_id": int(rng.integers(1, 4)),
                    "relative_pose": {
                        "position": [float(v) for v in t],
                        "rotation": [float(v) for v in np.asarray(R).reshape(-1)],
                    },
                    "intrinsics": [100.0, 0, W / 2, 0, 100.0, H / 2, 0, 0, 1],
                })
                ann_id += 1
        cats = [{"supercategory": "background", "id": 0, "name": "background"}]
        cats += [{"supercategory": v, "id": int(k), "name": v}
                 for k, v in classes.items()]
        with open(f"{root}/annotations/{split}.json", "w") as f:
            json.dump({"images": images, "annotations": annotations,
                       "categories": cats}, f)

    make_split("train", n_train, "train")
    make_split("test", n_test, "test_all")
    with open(f"{root}/annotations/classes.json", "w") as f:
        json.dump(classes, f)
    with open(f"{root}/annotations/symmetries.json", "w") as f:
        json.dump({"obj_a": False, "obj_b": True, "obj_c": False}, f)
    info = {}
    for k in classes:
        pts = rng.normal(scale=20.0, size=(100, 3))
        with open(f"{root}/models_eval/obj_{int(k):06d}.ply", "wb") as f:
            f.write(b"ply\nformat binary_little_endian 1.0\n")
            f.write(f"element vertex {len(pts)}\n".encode())
            f.write(b"property float x\nproperty float y\nproperty float z\nend_header\n")
            for p in pts:
                f.write(struct.pack("<fff", *p))
        info[k] = {"diameter": float(2 * np.abs(pts).max())}
    with open(f"{root}/models_eval/models_info.json", "w") as f:
        json.dump(info, f)
    return root


def _write_ply(path, pts):
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(pts)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\nend_header\n")
        for p in pts:
            f.write(struct.pack("<fff", *p))


def make_synthetic_bop_dataset(root, n_scenes=1, n_imgs=3, n_classes=21,
                               H=96, W=128, seed=0):
    """BOP-layout fixture: test/<scene>/{rgb, scene_gt, scene_gt_info,
    scene_camera} + models_eval with obj_XXXXXX.ply and models_info.json —
    the directory shape `scripts/repro_bop.sh` consumes (the same shape the
    real YCB-V/LM-O BOP archives unpack to)."""
    rng = np.random.default_rng(seed)
    os.makedirs(f"{root}/models_eval", exist_ok=True)
    info = {}
    for k in range(1, n_classes + 1):
        pts = rng.normal(scale=20.0, size=(100, 3))
        _write_ply(f"{root}/models_eval/obj_{k:06d}.ply", pts)
        info[str(k)] = {"diameter": float(2 * np.abs(pts).max())}
    with open(f"{root}/models_eval/models_info.json", "w") as f:
        json.dump(info, f)

    cam_K = [100.0, 0, W / 2, 0, 100.0, H / 2, 0, 0, 1]
    for s in range(1, n_scenes + 1):
        scene = f"{root}/test/{s:06d}"
        os.makedirs(f"{scene}/rgb", exist_ok=True)
        gt, gt_info, cam = {}, {}, {}
        for i in range(n_imgs):
            arr = (rng.uniform(size=(H, W, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(f"{scene}/rgb/{i:06d}.png")
            objs, infos = [], []
            for _ in range(int(rng.integers(1, 4))):
                q, r = np.linalg.qr(rng.normal(size=(3, 3)))
                q *= np.sign(np.diag(r))
                if np.linalg.det(q) < 0:
                    q[:, 0] *= -1
                t_mm = (rng.uniform(-0.2, 0.2, 3) + [0, 0, 0.8]) * 1000.0
                objs.append({
                    "cam_R_m2c": [float(v) for v in q.reshape(-1)],
                    "cam_t_m2c": [float(v) for v in t_mm],
                    "obj_id": int(rng.integers(1, 4)),
                })
                x = float(rng.uniform(5, W - 40))
                y = float(rng.uniform(5, H - 40))
                w = float(rng.uniform(10, 30))
                h = float(rng.uniform(10, 30))
                infos.append({"bbox_obj": [x, y, w, h],
                              "bbox_visib": [x, y, w, h],
                              "visib_fract": float(rng.uniform(0.5, 1.0))})
            gt[str(i)] = objs
            gt_info[str(i)] = infos
            cam[str(i)] = {"cam_K": cam_K, "depth_scale": 0.1}
        with open(f"{scene}/scene_gt.json", "w") as f:
            json.dump(gt, f)
        with open(f"{scene}/scene_gt_info.json", "w") as f:
            json.dump(gt_info, f)
        with open(f"{scene}/scene_camera.json", "w") as f:
            json.dump(cam, f)
    return root
