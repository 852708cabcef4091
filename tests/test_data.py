"""Data pipeline tests: dataset parsing, loader batching, converter."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from poet_tpu.data.dataset import PoseDataset
from poet_tpu.data.loader import PoseDataLoader
from poet_tpu.data.structures import pad_targets
from poet_tpu.data.converters import convert_bop_to_poet, LMO_ID_MAP, LMO_CLASSES


@pytest.fixture
def mini_coco(tmp_path, rng):
    """3 images, variable object counts, full pose annotations."""
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, annotations = [], []
    ann_id = 0
    counts = [2, 1, 3]
    for i, n in enumerate(counts):
        arr = (rng.uniform(size=(48, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i}.png")
        images.append(
            {"id": i, "file_name": f"{i}.png", "width": 64, "height": 48,
             "intrinsics": [100.0, 0, 32, 0, 100, 24, 0, 0, 1], "type": "real"}
        )
        for j in range(n):
            R = np.eye(3)
            annotations.append(
                {
                    "id": ann_id, "image_id": i,
                    "bbox": [5.0 + 10 * j, 5.0, 12.0, 15.0],
                    "area": 180.0, "iscrowd": 0, "category_id": j + 1,
                    "relative_pose": {
                        "position": [0.1 * j, 0.0, 0.5],
                        "rotation": R.reshape(-1).tolist(),
                    },
                    "intrinsics": [100.0, 0, 32, 0, 100, 24, 0, 0, 1],
                }
            )
            ann_id += 1
    ann_file = tmp_path / "ann.json"
    with open(ann_file, "w") as f:
        json.dump({"images": images, "annotations": annotations, "categories": []}, f)
    return str(img_dir), str(ann_file), counts


def test_dataset_item(mini_coco, rng):
    img_dir, ann_file, counts = mini_coco
    from poet_tpu.data.transforms import make_pose_estimation_transform

    ds = PoseDataset(img_dir, ann_file, transforms=make_pose_estimation_transform("test"))
    assert len(ds) == 3
    img, tgt = ds.__getitem__(0, rng=rng)
    assert img.shape == (48, 64, 3) and img.dtype == np.float32
    assert img.min() >= 0 and img.max() <= 1
    assert len(tgt["boxes"]) == counts[0]
    # boxes are cxcywh normalized
    b = tgt["boxes"]
    assert np.all(b >= 0) and np.all(b <= 1)
    np.testing.assert_allclose(b[0], [(5 + 6) / 64, (5 + 7.5) / 48, 12 / 64, 15 / 48])
    assert tgt["relative_rotation"].shape == (counts[0], 3, 3)
    assert tgt["relative_quaternions"].shape == (counts[0], 4)
    assert tgt["intrinsics"].shape == (counts[0], 9)


def test_jitter_dataset(mini_coco, rng):
    img_dir, ann_file, counts = mini_coco
    from poet_tpu.data.transforms import make_pose_estimation_transform

    ds = PoseDataset(img_dir, ann_file, jitter=True, jitter_probability=1.0,
                     transforms=make_pose_estimation_transform("train"))
    _, tgt = ds.__getitem__(2, rng=rng)
    assert "jitter_boxes" in tgt
    assert tgt["jitter_boxes"].shape == tgt["boxes"].shape
    assert np.abs(tgt["jitter_boxes"] - tgt["boxes"]).max() > 0


def test_pad_targets(mini_coco, rng):
    img_dir, ann_file, counts = mini_coco
    from poet_tpu.data.transforms import make_pose_estimation_transform

    ds = PoseDataset(img_dir, ann_file, transforms=make_pose_estimation_transform("test"))
    items = [ds.__getitem__(i, rng=rng)[1] for i in range(3)]
    batch = pad_targets(items, num_queries=5)
    assert batch["boxes"].shape == (3, 5, 4)
    assert batch["labels"].shape == (3, 5)
    np.testing.assert_array_equal(batch["n_boxes"], counts)
    # padding conventions
    assert np.all(batch["boxes"][0, 2:] == -1.0)
    assert np.all(batch["labels"][0, 2:] == -1)
    assert batch["intrinsics"].shape == (3, 5, 9)


def test_loader_epoch(mini_coco):
    img_dir, ann_file, counts = mini_coco
    from poet_tpu.data.transforms import make_pose_estimation_transform

    ds = PoseDataset(img_dir, ann_file, transforms=make_pose_estimation_transform("test"))
    loader = PoseDataLoader(ds, batch_size=2, num_queries=5, shuffle=True,
                            drop_last=False, num_workers=2)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    images, pad_mask, targets = batches[0]
    assert images.shape == (2, 48, 64, 3)
    assert pad_mask.shape == (2, 48, 64)
    assert targets["boxes"].shape == (2, 5, 4)
    # determinism: same epoch -> same batches
    again = list(loader.epoch(0))
    np.testing.assert_array_equal(batches[0][0], again[0][0])
    # different epoch -> different order (with overwhelming probability)
    other = list(loader.epoch(1))
    assert not all(
        np.array_equal(batches[i][0], other[i][0]) for i in range(len(batches))
    )


def test_loader_process_sharding(mini_coco):
    img_dir, ann_file, _ = mini_coco
    from poet_tpu.data.transforms import make_pose_estimation_transform

    ds = PoseDataset(img_dir, ann_file, transforms=make_pose_estimation_transform("test"))
    idx0 = PoseDataLoader(ds, 1, 5, shuffle=False, process_index=0, process_count=2)._epoch_indices(0)
    idx1 = PoseDataLoader(ds, 1, 5, shuffle=False, process_index=1, process_count=2)._epoch_indices(0)
    assert len(idx0) == len(idx1) == 2  # 3 imgs padded to 4, 2 per process
    assert set(idx0.tolist() + idx1.tolist()) == {0, 1, 2}


def test_converter(tmp_path, rng):
    """Fake BOP scene -> PoET JSON with clamping + visibility filter."""
    scene = tmp_path / "test" / "000048"
    (scene / "rgb").mkdir(parents=True)
    for i in range(2):
        Image.new("RGB", (640, 480)).save(scene / "rgb" / f"{i:06d}.png")
    gt = {
        "0": [
            {"obj_id": 1, "cam_R_m2c": list(np.eye(3).reshape(-1)), "cam_t_m2c": [10.0, 20.0, 500.0]},
            {"obj_id": 5, "cam_R_m2c": list(np.eye(3).reshape(-1)), "cam_t_m2c": [0.0, 0.0, 700.0]},
        ],
        "1": [
            {"obj_id": 1, "cam_R_m2c": list(np.eye(3).reshape(-1)), "cam_t_m2c": [5.0, 5.0, 300.0]},
        ],
    }
    gt_info = {
        "0": [
            {"bbox_obj": [-10, 20, 50, 60], "visib_fract": 0.9},
            {"bbox_obj": [600, 440, 80, 80], "visib_fract": 0.02},  # filtered
        ],
        "1": [{"bbox_obj": [100, 100, 600, 30], "visib_fract": 1.0}],
    }
    cam = {k: {"cam_K": [1066.8, 0, 312.99, 0, 1067.5, 241.31, 0, 0, 1], "depth_scale": 0.1}
           for k in ("0", "1")}
    json.dump(gt, open(scene / "scene_gt.json", "w"))
    json.dump(gt_info, open(scene / "scene_gt_info.json", "w"))
    json.dump(cam, open(scene / "scene_camera.json", "w"))

    out_file = tmp_path / "ann" / "test.json"
    res = convert_bop_to_poet(str(tmp_path), ["test"], ["real"], str(out_file))
    assert len(res["images"]) == 2
    assert len(res["annotations"]) == 2  # low-visibility one removed
    a0 = res["annotations"][0]
    assert a0["bbox"][0] == 0 and a0["bbox"][2] == 40     # clamped left
    np.testing.assert_allclose(a0["relative_pose"]["position"], [0.01, 0.02, 0.5])
    a1 = res["annotations"][1]
    assert a1["bbox"][2] == 640 - 100 - 1                 # clamped width


def test_converter_keyframe_split(tmp_path):
    """Synthetic BOP tree + keyframe list -> exactly the keyframe-subset JSON
    (ycbv2poet.py:57-65,140-144 semantics: key = scene_dir[2:] + '/' + stem),
    and the vendored dataset_files/keyframes.txt resolves + parses."""
    from poet_tpu.data.converters import load_keyframes, vendored_keyframes_path

    scene = tmp_path / "test" / "000048"
    (scene / "rgb").mkdir(parents=True)
    n = 4
    for i in range(n):
        Image.new("RGB", (640, 480)).save(scene / "rgb" / f"{i:06d}.png")
    eye = list(np.eye(3).reshape(-1))
    gt = {str(i): [{"obj_id": 1, "cam_R_m2c": eye, "cam_t_m2c": [0, 0, 500.0]}]
          for i in range(n)}
    gt_info = {str(i): [{"bbox_obj": [10, 10, 30, 30], "visib_fract": 1.0}]
               for i in range(n)}
    cam = {str(i): {"cam_K": [1066.8, 0, 312.99, 0, 1067.5, 241.31, 0, 0, 1]}
           for i in range(n)}
    json.dump(gt, open(scene / "scene_gt.json", "w"))
    json.dump(gt_info, open(scene / "scene_gt_info.json", "w"))
    json.dump(cam, open(scene / "scene_camera.json", "w"))

    # keyframe list in the reference's exact key format (scene 000048 -> 0048)
    kf = ["0048/000001", "0048/000003"]
    res = convert_bop_to_poet(
        str(tmp_path), ["test"], ["real"], str(tmp_path / "kf.json"),
        keyframes=kf)
    assert [im["file_name"] for im in res["images"]] == [
        os.path.join("test", "000048", "rgb", "000001.png"),
        os.path.join("test", "000048", "rgb", "000003.png"),
    ]
    assert len(res["annotations"]) == 2
    # without the list: the full split
    res_full = convert_bop_to_poet(
        str(tmp_path), ["test"], ["real"], str(tmp_path / "full.json"))
    assert len(res_full["images"]) == n

    # vendored asset: present, 2,949 lines, reference key format
    vend = load_keyframes()
    assert os.path.basename(vendored_keyframes_path()) == "keyframes.txt"
    assert len(vend) == 2949
    assert all(len(k.split("/")) == 2 for k in vend[:10])
    assert vend[0] == "0048/000001"


def test_converter_lmo_id_map(tmp_path):
    scene = tmp_path / "test" / "000002"
    (scene / "rgb").mkdir(parents=True)
    Image.new("RGB", (640, 480)).save(scene / "rgb" / "000000.png")
    gt = {"0": [
        {"obj_id": 5, "cam_R_m2c": list(np.eye(3).reshape(-1)), "cam_t_m2c": [0, 0, 400.0]},
        {"obj_id": 3, "cam_R_m2c": list(np.eye(3).reshape(-1)), "cam_t_m2c": [0, 0, 400.0]},  # not in LM-O
    ]}
    gt_info = {"0": [
        {"bbox_obj": [10, 10, 30, 30], "visib_fract": 1.0},
        {"bbox_obj": [50, 50, 30, 30], "visib_fract": 1.0},
    ]}
    cam = {"0": {"cam_K": [572.4, 0, 325.26, 0, 573.57, 242.04, 0, 0, 1]}}
    json.dump(gt, open(scene / "scene_gt.json", "w"))
    json.dump(gt_info, open(scene / "scene_gt_info.json", "w"))
    json.dump(cam, open(scene / "scene_camera.json", "w"))
    res = convert_bop_to_poet(
        str(tmp_path), ["test"], ["real"], str(tmp_path / "out.json"),
        obj_id_map=LMO_ID_MAP, class_names=LMO_CLASSES,
    )
    assert len(res["annotations"]) == 1
    assert res["annotations"][0]["category_id"] == 2      # raw 5 -> lmo 2


def test_native_and_pil_decode_paths_identical(mini_coco, rng, monkeypatch):
    """The C++ decode fast path must be bit-identical to the PIL path through
    the full dataset pipeline (decode -> transforms -> targets)."""
    from poet_tpu import native as native_mod
    if not native_mod.imagepipe_available():
        pytest.skip("native imagepipe unavailable")
    img_dir, ann_file, _ = mini_coco
    from poet_tpu.data.transforms import make_pose_estimation_transform

    ds = PoseDataset(
        img_dir, ann_file,
        transforms=make_pose_estimation_transform("train", True, True),
    )
    for idx in range(len(ds)):
        monkeypatch.delenv("POET_TPU_DISABLE_NATIVE_DECODE", raising=False)
        img_n, tgt_n = ds.__getitem__(idx, rng=np.random.default_rng(idx))
        monkeypatch.setenv("POET_TPU_DISABLE_NATIVE_DECODE", "1")
        img_p, tgt_p = ds.__getitem__(idx, rng=np.random.default_rng(idx))
        np.testing.assert_array_equal(img_n, img_p)
        assert img_n.dtype == np.float32
        for k in tgt_n:
            np.testing.assert_array_equal(np.asarray(tgt_n[k]), np.asarray(tgt_p[k]))


def test_decoded_image_cache(mini_coco, rng):
    """decoded_cache_mb: epoch 2 reads no blobs for cached images, results
    identical to the uncached dataset; budget 0 disables caching."""
    img_dir, ann_file, _ = mini_coco
    from poet_tpu.data.transforms import make_pose_estimation_transform

    tf = make_pose_estimation_transform("test")
    ds = PoseDataset(img_dir, ann_file, transforms=tf, decoded_cache_mb=64)
    ref = PoseDataset(img_dir, ann_file, transforms=tf)
    blob_calls = {"n": 0}
    orig = ds._get_blob

    def counting_get_blob(path):
        blob_calls["n"] += 1
        return orig(path)

    ds._get_blob = counting_get_blob
    first = [ds.__getitem__(i, rng=np.random.default_rng(i)) for i in range(len(ds))]
    assert blob_calls["n"] == len(ds)
    second = [ds.__getitem__(i, rng=np.random.default_rng(i)) for i in range(len(ds))]
    assert blob_calls["n"] == len(ds), "second epoch must be decode-free"
    assert ds._decoded_bytes > 0
    for (a, ta), (b, tb) in zip(first, second):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for i in range(len(ds)):
        img_ref, tgt_ref = ref.__getitem__(i, rng=np.random.default_rng(i))
        np.testing.assert_array_equal(np.asarray(first[i][0]), np.asarray(img_ref))
        for k in tgt_ref:
            np.testing.assert_array_equal(
                np.asarray(first[i][1][k]), np.asarray(tgt_ref[k]))

    ds0 = PoseDataset(img_dir, ann_file, transforms=tf)  # default: off
    ds0.__getitem__(0, rng=np.random.default_rng(0))
    assert ds0._decoded_cache == {} and ds0._decoded_bytes == 0

    # the full train augmentation pipeline must accept the cache's READ-ONLY
    # arrays (all transforms copy-on-write) and stay equal to uncached
    tf_train = make_pose_estimation_transform("train", True, True)
    ds_t = PoseDataset(img_dir, ann_file, transforms=tf_train,
                       decoded_cache_mb=64)
    ref_t = PoseDataset(img_dir, ann_file, transforms=tf_train)
    ds_t.__getitem__(0, rng=np.random.default_rng(5))  # fill cache
    img_a, _ = ds_t.__getitem__(0, rng=np.random.default_rng(7))   # cache hit
    img_b, _ = ref_t.__getitem__(0, rng=np.random.default_rng(7))
    np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))


def test_synthetic_rgba_composite(tmp_path, rng):
    """'synt' images decode RGBA and composite onto a random background; the
    native and PIL decode paths agree."""
    img_dir = tmp_path / "imgs"
    bg_dir = tmp_path / "bg"
    img_dir.mkdir(); bg_dir.mkdir()
    rgba = (rng.uniform(size=(48, 64, 4)) * 255).astype(np.uint8)
    rgba[..., 3] = (rng.uniform(size=(48, 64)) > 0.5) * 255  # hard alpha mask
    Image.fromarray(rgba, "RGBA").save(img_dir / "0.png")
    bg = (rng.uniform(size=(48, 64, 3)) * 255).astype(np.uint8)
    Image.fromarray(bg).save(bg_dir / "bg.png")
    ann = {
        "images": [{"id": 0, "file_name": "0.png", "width": 64, "height": 48,
                    "type": "synt"}],
        "annotations": [{"id": 0, "image_id": 0, "bbox": [5.0, 5.0, 12.0, 15.0],
                         "area": 180.0, "iscrowd": 0, "category_id": 1}],
        "categories": [],
    }
    ann_file = tmp_path / "ann.json"
    with open(ann_file, "w") as f:
        json.dump(ann, f)

    ds = PoseDataset(str(img_dir), str(ann_file),
                     synthetic_background=str(bg_dir))
    img_n, _ = ds.__getitem__(0, rng=np.random.default_rng(3))
    os.environ["POET_TPU_DISABLE_NATIVE_DECODE"] = "1"
    try:
        img_p, _ = ds.__getitem__(0, rng=np.random.default_rng(3))
    finally:
        del os.environ["POET_TPU_DISABLE_NATIVE_DECODE"]
    img_n = np.asarray(img_n); img_p = np.asarray(img_p)
    np.testing.assert_array_equal(img_n, img_p)
    # alpha=0 pixels must show the background, alpha=255 the foreground
    fg_mask = rgba[..., 3] == 255
    np.testing.assert_array_equal(np.asarray(img_n)[fg_mask], rgba[fg_mask][:, :3])

    # decoded cache (RGBA foregrounds + backgrounds) reproduces the same
    # composite for the same rng and stops reading blobs on the second pass
    ds_c = PoseDataset(str(img_dir), str(ann_file),
                       synthetic_background=str(bg_dir), decoded_cache_mb=16)
    img_c1, _ = ds_c.__getitem__(0, rng=np.random.default_rng(3))
    assert ds_c._decoded_bytes > 0
    calls = {"n": 0}
    orig = ds_c._get_blob
    ds_c._get_blob = lambda p: (calls.__setitem__("n", calls["n"] + 1), orig(p))[1]
    img_c2, _ = ds_c.__getitem__(0, rng=np.random.default_rng(3))
    assert calls["n"] == 0
    np.testing.assert_array_equal(np.asarray(img_c1), img_n)
    np.testing.assert_array_equal(np.asarray(img_c2), img_n)


def test_numpy_quaternion_twins_match_jnp(rng):
    """The host pipeline's pure-numpy rot2quat/quat2rot must match the device
    versions (the data path must not dispatch JAX ops — see dataset.py)."""
    import jax.numpy as jnp
    from poet_tpu.utils import quaternions as Q

    a = rng.normal(size=(20, 3, 3))
    q_, r_ = np.linalg.qr(a)
    q_ *= np.sign(np.diagonal(r_, axis1=1, axis2=2))[:, None, :]
    det = np.linalg.det(q_)
    q_[:, :, 0] *= det[:, None]
    np.testing.assert_allclose(
        Q.rot2quat_np(q_), np.asarray(Q.rot2quat(jnp.asarray(q_))), atol=1e-5
    )
    quats = Q.rot2quat_np(q_)
    np.testing.assert_allclose(
        Q.quat2rot_np(quats), np.asarray(Q.quat2rot(jnp.asarray(quats))), atol=1e-6
    )
    # roundtrip closes
    np.testing.assert_allclose(Q.quat2rot_np(quats), q_, atol=1e-8)
