"""Model factory. Parity: models/__init__.py + build() at
models/pose_estimation_transformer.py:692-739."""

from __future__ import annotations

from poet_tpu.config import PoETConfig
from poet_tpu.models.backbone import (
    MaskRCNNDetectorBackbone,
    MaskRCNNFeatureBackbone,
)
from poet_tpu.models.poet import MLP, PoET  # noqa: F401
from poet_tpu.models.matcher import MatchResult, match_poses  # noqa: F401
from poet_tpu.models import criterion  # noqa: F401

# LM-O dataset id remap (backbone_maskrcnn.py:55-57)
LMO_OBJ_ID_MAP = ((1, 1), (5, 2), (6, 3), (8, 4), (9, 5), (10, 6), (11, 7), (12, 8))


def build_model(cfg: PoETConfig) -> PoET:
    """Construct the PoET flax module for a config.

    The criterion/matcher are pure functions (poet_tpu.models.criterion /
    .matcher) rather than stateful modules — see engine.train for how they
    compose into the jitted train step.

    In gt/jitter bbox modes, the detector heads are never consumed
    (pose_estimation_transformer.py:203-239 only touches feature maps), so
    the cheaper feature-only backbone is used; 'backbone' mode and inference
    get the full RPN + RoI-heads detector.
    """
    if cfg.backbone.name in ("maskrcnn", "fasterrcnn"):
        # optional rcnn YAML (parity: configs/*_rcnn.yaml read at
        # backbone_maskrcnn.py:129-150): label map -> detector class count,
        # anchor_sizes -> AnchorGenerator, input_resize recorded (the
        # reference's forward never applies the resize transform it
        # configures, so it has no runtime effect; see BackboneConfig).
        det_classes = cfg.model.n_classes + 1
        if cfg.backbone.cfg_path and cfg.backbone.cfg_path.endswith((".yaml", ".yml")):
            import yaml

            with open(cfg.backbone.cfg_path) as f:
                rcnn_cfg = yaml.safe_load(f)
            det_classes = len(rcnn_cfg.get("label_to_category_id", {})) or det_classes
            assert rcnn_cfg.get("backbone_str", "resnet50-fpn") == "resnet50-fpn"
            if rcnn_cfg.get("anchor_sizes"):
                cfg.backbone.anchor_sizes = tuple(
                    tuple(int(x) for x in lvl) for lvl in rcnn_cfg["anchor_sizes"]
                )
            if rcnn_cfg.get("input_resize"):
                cfg.backbone.input_resize = tuple(rcnn_cfg["input_resize"])
        import jax.numpy as jnp

        bb_dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32
        if cfg.model.bbox_mode == "backbone" or cfg.runtime.inference:
            obj_map = LMO_OBJ_ID_MAP if cfg.data.dataset == "lmo" else None
            backbone = MaskRCNNDetectorBackbone(
                num_classes=det_classes,
                max_detections=cfg.backbone.max_detections,
                post_nms_top_n=cfg.backbone.post_nms_top_n,
                obj_id_map=obj_map,
                anchor_sizes=cfg.backbone.anchor_sizes,
                dtype=bb_dtype,
            )
        else:
            backbone = MaskRCNNFeatureBackbone(dtype=bb_dtype)
    elif cfg.backbone.name == "yolov4":
        import jax.numpy as jnp

        from poet_tpu.models.yolov4 import YOLOv4Backbone, load_cfg_sections

        cfg_path = cfg.backbone.cfg_path
        if not cfg_path:
            # fall back to the shipped cfg for the chosen dataset (generated
            # by scripts/gen_yolov4_csp_cfg.py) so --backbone yolov4 runs
            # out of the box, mirroring the reference's configs/ layout.
            import os

            repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
            cfg_path = os.path.join(
                repo_root, "configs", f"{cfg.data.dataset}_yolov4-csp.cfg")
            assert os.path.exists(cfg_path), (
                "--backbone_cfg (darknet cfg) required for yolov4; shipped "
                f"default not found at {cfg_path}")
        backbone = YOLOv4Backbone(
            cfg_sections=load_cfg_sections(cfg_path),
            conf_thresh=cfg.backbone.conf_thresh,
            iou_thresh=cfg.backbone.iou_thresh,
            agnostic_nms=cfg.backbone.agnostic_nms,
            max_detections=cfg.backbone.max_detections,
            encoder_min_stride=cfg.backbone.encoder_min_stride,
            box_decode=cfg.backbone.yolo_box_decode,
            dtype=jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32,
        )
    else:
        raise NotImplementedError(f"backbone {cfg.backbone.name!r}")
    return PoET(
        backbone=backbone,
        cfg=cfg.model,
        position_embedding=cfg.backbone.position_embedding,
        position_embedding_scale=cfg.backbone.position_embedding_scale,
    )
