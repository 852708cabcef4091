"""Model factory. Parity: models/__init__.py + build() at
models/pose_estimation_transformer.py:692-739."""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from poet_tpu.config import PoETConfig
from poet_tpu.models.backbone import MaskRCNNFeatureBackbone
from poet_tpu.models.poet import MLP, PoET  # noqa: F401
from poet_tpu.models.matcher import MatchResult, match_poses  # noqa: F401
from poet_tpu.models import criterion  # noqa: F401


def build_model(cfg: PoETConfig) -> PoET:
    """Construct the PoET flax module for a config.

    The criterion/matcher are pure functions (poet_tpu.models.criterion /
    .matcher) rather than stateful modules — see engine.train for how they
    compose into the jitted train step.
    """
    if cfg.backbone.name in ("maskrcnn", "fasterrcnn"):
        backbone = MaskRCNNFeatureBackbone()
    else:
        raise NotImplementedError(
            f"backbone {cfg.backbone.name!r} not available yet (yolov4 lands later)"
        )
    return PoET(backbone=backbone, cfg=cfg.model)
