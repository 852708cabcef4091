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
