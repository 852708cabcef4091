"""Evaluation loops: pose metrics + BOP export.

Parity targets: engine.py:96-184 (pose_evaluate) and engine.py:187-242
(bop_evaluate). The model forward + final-layer matching run jitted on
device; only the matched pose pairs are pulled to host for metric
accumulation (the reference pulls per batch too, engine.py:130-141).
"""

from __future__ import annotations

import datetime
import os
import time
from pathlib import Path
from typing import Optional

import numpy as np

from poet_tpu.config import PoETConfig
from poet_tpu.engine.train import make_eval_forward
from poet_tpu.utils import quaternions as Q

import jax.numpy as jnp


def _matched_pairs_to_host(out, targets, rotation_mode):
    """Extract matched (pred, tgt) pose pairs as numpy. Parity: engine.py:127-141."""
    valid = np.asarray(out["match_valid"])
    tgt_idx = np.asarray(out["match_tgt_idx"])
    pred_t = np.asarray(out["pred_translation"])
    pred_r = np.asarray(out["pred_rotation"])
    if rotation_mode in ("quat", "silho_quat"):
        pred_r = np.asarray(Q.quat2rot(jnp.asarray(pred_r)))
    tgt_t = np.asarray(targets["relative_position"])
    tgt_r = np.asarray(targets["relative_rotation"])
    labels = np.asarray(targets["labels"])
    intr = np.asarray(targets.get("intrinsics")) if "intrinsics" in targets else None
    image_ids = np.asarray(targets["image_id"]) if "image_id" in targets else None

    pairs = []
    B, Qn = valid.shape
    for b in range(B):
        for i in range(Qn):
            if not valid[b, i]:
                continue
            j = tgt_idx[b, i]
            pairs.append(
                dict(
                    cls=int(labels[b, j]),
                    pred_rotation=pred_r[b, i],
                    pred_translation=pred_t[b, i],
                    tgt_rotation=tgt_r[b, j],
                    tgt_translation=tgt_t[b, j],
                    intrinsics=intr[b, j] if intr is not None else None,
                    image_id=int(image_ids[b]) if image_ids is not None else -1,
                )
            )
    return pairs


def pose_evaluate(model, params, pose_evaluator, data_loader, cfg: PoETConfig,
                  image_set: str, epoch: Optional[int] = None,
                  output_dir: Optional[str] = None, device_put_fn=None):
    """Full-dataset pose evaluation. Parity: engine.py:96-184."""
    output_dir = output_dir or cfg.runtime.output_dir
    bbox_mode = cfg.model.bbox_mode
    if epoch is not None:
        out_dir = os.path.join(output_dir, f"eval_{image_set}_{bbox_mode}_{epoch}") + "/"
    else:
        out_dir = os.path.join(output_dir, f"eval_{image_set}_{bbox_mode}") + "/"
    Path(out_dir).mkdir(parents=True, exist_ok=True)

    pose_evaluator.reset()
    forward = make_eval_forward(model, cfg)

    print("Process validation dataset:")
    n_images = len(data_loader.dataset)
    processed = 0
    start = time.time()
    file_names = {i: data_loader.dataset.file_name(i) for i in data_loader.dataset.ids}
    for images, pad_mask, targets in data_loader.epoch(0):
        out = forward(params, images, pad_mask, targets)
        pairs = _matched_pairs_to_host(out, targets, cfg.model.rotation_representation)
        for pr in pairs:
            pose_evaluator.record(
                pr["cls"], pr["pred_rotation"], pr["pred_translation"],
                pr["tgt_rotation"], pr["tgt_translation"],
                img_file=file_names.get(pr["image_id"], ""),
                intrinsics=pr["intrinsics"],
            )
        processed += images.shape[0]
        print(f"Processed {processed}/{n_images}")
    total = time.time() - start
    print(f"Network Processing Time: {datetime.timedelta(seconds=int(total))}  "
          f"Images: {processed}  s/img: {total / max(processed, 1):.4f}")

    print("Start Calculating ADD")
    pose_evaluator.evaluate_pose_add(out_dir)
    print("Start Calculating ADD-S")
    pose_evaluator.evaluate_pose_adi(out_dir)
    print("Start Calculating ADD(-S)")
    results = pose_evaluator.evaluate_pose_adds(out_dir)
    print("Start Calculating Average Translation Error")
    pose_evaluator.calculate_class_avg_translation_error(out_dir)
    print("Start Calculating Average Rotation Error")
    pose_evaluator.calculate_class_avg_rotation_error(out_dir)
    return results


def bop_evaluate(model, params, data_loader, cfg: PoETConfig, image_set: str,
                 output_dir: Optional[str] = None):
    """BOP-challenge CSV export. Parity: engine.py:187-242 — one row per
    matched object: scene_id, im_id, obj_id, score, R (row-major), t (mm),
    per-batch forward wall time."""
    output_dir = output_dir or cfg.runtime.output_dir
    out_dir = os.path.join(output_dir, f"bop_{cfg.model.bbox_mode}") + "/"
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    forward = make_eval_forward(model, cfg)

    file_names = {i: data_loader.dataset.file_name(i) for i in data_loader.dataset.ids}
    csv_path = os.path.join(out_dir, f"{cfg.data.dataset}.csv")
    with open(csv_path, "w") as f:
        f.write("scene_id,im_id,obj_id,score,R,t,time")
        counter = 1
        for images, pad_mask, targets in data_loader.epoch(0):
            t0 = time.time()
            out = forward(params, images, pad_mask, targets)
            np.asarray(out["pred_translation"])  # force sync for honest timing
            pred_time = time.time() - t0
            pairs = _matched_pairs_to_host(out, targets, cfg.model.rotation_representation)
            for pr in pairs:
                img_file = file_names.get(pr["image_id"], "//0/0.png")
                info = img_file.split("/")
                scene_id = int(info[1]) if len(info) > 3 and info[1].isdigit() else 0
                img_id = int(os.path.splitext(info[-1])[0]) if info[-1][:1].isdigit() else 0
                R = pr["pred_rotation"]
                t = pr["pred_translation"] * 1000.0
                f.write(
                    "\n{},{},{},{},{} {} {} {} {} {} {} {} {}, {} {} {}, {}".format(
                        scene_id, img_id, pr["cls"], 1.0,
                        R[0, 0], R[0, 1], R[0, 2], R[1, 0], R[1, 1], R[1, 2],
                        R[2, 0], R[2, 1], R[2, 2], t[0], t[1], t[2], pred_time,
                    )
                )
            print(f"Processed batch {counter}")
            counter += 1
    return csv_path
