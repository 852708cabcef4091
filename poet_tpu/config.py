"""Configuration tree for poet_tpu.

Mirrors every CLI flag of the reference (`/root/reference/main.py:33-189`) as a
typed dataclass hierarchy instead of one flat argparse namespace. The flat CLI
surface is preserved by `poet_tpu.cli`, which maps `--flag` spellings onto this
tree, so reference users can switch with unchanged command lines.
"""

from __future__ import annotations

import dataclasses
import json
import math
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


def _default_backend_is_tpu() -> bool:
    """True iff jax's default backend is a TPU (incl. tunneled plugins whose
    platform string differs but whose device_kind says TPU). Lazy import:
    poet_tpu.data's loader workers import config without touching jax."""
    try:
        import jax

        dev = jax.devices()[0]
        return ("tpu" in dev.platform.lower()
                or "tpu" in getattr(dev, "device_kind", "").lower())
    except Exception:  # pragma: no cover - no backend at all
        return False


@dataclass
class OptimConfig:
    # Reference: main.py:38-50
    lr: float = 2e-4
    lr_backbone_names: Tuple[str, ...] = ("backbone",)
    lr_backbone: float = 2e-5
    lr_linear_proj_names: Tuple[str, ...] = ("reference_points", "sampling_offsets")
    lr_linear_proj_mult: float = 0.1
    batch_size: int = 16
    eval_batch_size: int = 16
    weight_decay: float = 1e-4
    epochs: int = 50
    lr_drop: int = 100              # StepLR-equivalent drop interval (epochs)
    clip_max_norm: float = 0.1
    sgd: bool = False               # main.py:160 — SGD(momentum=0.9) instead of AdamW
    # Extension (absent in the reference, SURVEY §2.3): average gradients
    # over N micro-batches before each optimizer update (optax.MultiSteps) —
    # effective batch = batch_size * grad_accum_steps at constant HBM.
    grad_accum_steps: int = 1
    # Extension: keep the AdamW FIRST moment in bfloat16 (optax mu_dtype) —
    # halves its memory; the second moment stays f32. Composes with ZeRO-1.
    mu_bf16: bool = False


@dataclass
class BackboneConfig:
    # Reference: main.py:52-71
    name: str = "maskrcnn"          # {maskrcnn, fasterrcnn, yolov4}
    cfg_path: str = ""              # YAML (rcnn) / darknet cfg (yolov4)
    weights: Optional[str] = None
    conf_thresh: float = 0.4
    iou_thresh: float = 0.5
    agnostic_nms: bool = False
    position_embedding: str = "sine"     # {sine, learned}
    position_embedding_scale: float = 2 * math.pi
    # static-shape detector caps (TPU: NMS/top-k must have fixed sizes)
    max_detections: int = 100
    # RPN proposals entering the RoI heads (torchvision test-time default
    # 1000). A serving/dryrun knob: lowering it shrinks the RoI-align and
    # box-head work proportionally at some recall cost.
    post_nms_top_n: int = 1000
    input_size: Tuple[int, int] = (480, 640)   # (H, W), constant per config
    # rcnn YAML `anchor_sizes` (per FPN level); None -> torchvision defaults.
    # `input_resize` is recorded for parity but has no runtime effect: the
    # reference's forward never applies the GeneralizedRCNNTransform it
    # configures (backbone_maskrcnn.py:34-35 vs :59-125).
    anchor_sizes: Optional[Tuple[Tuple[int, ...], ...]] = None
    input_resize: Optional[Tuple[int, int]] = None
    # TPU-first option (extension): drop backbone feature maps finer than
    # this stride from the TRANSFORMER input (the detection head still uses
    # every scale). The encoder's sampling cost is quadratic in token count
    # (README roofline analysis), so the yolov4 path's stride-8 map (4x the
    # tokens) costs ~16x the encoder compute of the rcnn pyramid; setting 16
    # here gives an rcnn-sized encoder on yolo features. Default 1 = keep
    # every map (reference behavior). Honored by the yolov4 backbone; the
    # rcnn path already emits strides 16/32/64 only (FPN level pruning).
    encoder_min_stride: int = 1
    # yolov4 box decode: 'u5' = the reference wrapper's PyTorch decode
    # (also darknet new_coords=1/scale_x_y=2); 'darknet' = classic darknet
    # new_coords=0, honoring the cfg's per-head scale_x_y with exp-wh — for
    # .weights files trained with darknet itself.
    yolo_box_decode: str = "u5"


@dataclass
class ModelConfig:
    # Reference: main.py:73-105
    bbox_mode: str = "gt"                 # {gt, backbone, jitter}
    reference_points: str = "bbox"        # {bbox, learned}
    query_embedding: str = "bbox"         # {bbox, learned}
    rotation_representation: str = "6d"   # {6d, quat, silho_quat}
    class_mode: str = "specific"          # {agnostic, specific}
    num_feature_levels: int = 4
    enc_layers: int = 5
    dec_layers: int = 5
    dim_feedforward: int = 1024
    hidden_dim: int = 256
    dropout: float = 0.1
    nheads: int = 16
    num_queries: int = 10
    dec_n_points: int = 4
    enc_n_points: int = 4
    aleatoric: bool = False
    calibrate: bool = False
    aux_loss: bool = True
    n_classes: int = 21
    # transformer compute dtype; params stay f32 (mixed precision)
    dtype: str = "float32"
    # encoder deformable-sampling core: 'auto' (fused Pallas kernel on a TPU
    # backend — the fastest measured path — falling back to 'sep' anywhere
    # Pallas can't compile: CPU meshes, dryruns, interpret-free tests) |
    # 'fused' | 'sep' (separable one-hot matmuls, fastest pure-XLA path:
    # 6 ms/layer vs 19 ms 'mxu' at bs=16; runs identically on every backend)
    # | 'mxu' | 'patch' | 'gather' | 'pallas' | 'sep_cv'
    enc_deform_impl: str = "auto"
    # decoder cross-attention sampling core. 'auto' resolves by MEMORY
    # length at trace time (models/transformer.py:resolve_dec_impl): 'mxu'
    # (one-hot matmuls) below ~4k tokens — at the rcnn pyramid (S=1600,
    # Q = num_queries ~10) it beat the fused Pallas kernel in the on-chip
    # flagship A/B (27.59 vs 28.71 ms/batch, 2026-08-19) because the
    # kernel's per-layer vT layout transposes of the full encoder memory
    # dwarf its compute win at one 128-lane query tile — and 'fused' on a
    # TPU at/above it (the one-hot compare domain is O(S) per query while
    # the kernel's cost is dominated by the same O(S) vT staging it already
    # pays; at YOLO scale S=6380 the one-hot matmuls cost 3.3 ms/iter).
    # Explicit values win for A/Bs and future geometries.
    dec_deform_impl: str = "auto"
    # Rematerialize encoder layers in the backward pass: 'auto' | 'on' | 'off'.
    # 'auto' remats for the one-hot/XLA formulations (their autodiff residuals
    # — one-hot select predicates at Q = S tokens — were measured to want
    # 64 GB HBM at bs=16) but NOT for 'fused', whose custom VJP keeps only the
    # kernel inputs as residuals (~0.3 GB/layer) and re-running the 3.6 ms
    # forward kernel per layer in the backward is pure waste.
    enc_remat: str = "auto"

    def resolved_enc_deform_impl(self) -> str:
        """'auto' -> 'fused' iff the default JAX backend is a TPU.

        Resolution is deliberately lazy (at model-build time, after the
        caller has picked a platform): the multi-chip dryrun and the CPU
        test mesh force jax_platforms=cpu first, so they resolve to 'sep'
        without any configuration.
        """
        if self.enc_deform_impl != "auto":
            return self.enc_deform_impl
        return "fused" if _default_backend_is_tpu() else "sep"

    def resolved_dec_deform_impl(self) -> str:
        """'auto' passes through: the decoder impl depends on the MEMORY
        length, which only the transformer knows (it is resolved per trace
        in models/transformer.py:resolve_dec_impl; see the field comment)."""
        return self.dec_deform_impl

    def enc_remat_enabled(self) -> bool:
        if self.enc_remat == "auto":
            return self.resolved_enc_deform_impl() != "fused"
        return self.enc_remat == "on"

    @property
    def rot_dim(self) -> int:
        return 6 if self.rotation_representation == "6d" else 4


@dataclass
class MatcherConfig:
    # Reference: main.py:107-114
    matcher_type: str = "pose"
    set_cost_class: float = 1.0
    set_cost_bbox: float = 1.0
    # reaches only the legacy HungarianMatcher, which is CLI-unreachable in
    # the reference too (choices=['pose'], main.py:108)
    set_cost_giou: float = 2.0
    giou_thresh: float = 0.5        # backbone-mode post filter (matcher.py:128)


@dataclass
class LossConfig:
    # Reference: main.py:117-122
    translation_loss_coef: float = 1.0
    rotation_loss_coef: float = 1.0


@dataclass
class DataConfig:
    # Reference: main.py:124-139
    dataset: str = "ycbv"           # {ycbv, lmo}
    dataset_path: str = "/data"
    train_set: str = "train"
    eval_set: str = "test"
    synt_background: Optional[str] = None
    jitter_probability: float = 0.5
    rgb_augmentation: bool = False
    grayscale: bool = False
    num_workers: int = 0
    cache_mode: bool = False
    # extension: decoded-uint8 image cache budget (MB); 0 = off. Makes
    # epochs 2+ decode-free for datasets that fit (a 480x640 RGB frame is
    # ~0.9 MB decoded)
    decoded_cache_mb: int = 0


@dataclass
class EvalConfig:
    # Reference: main.py:141-149
    eval_interval: int = 10
    class_info: str = "/annotations/classes.json"
    models_path: str = "/models_eval/"
    model_symmetry: str = "/annotations/symmetries.json"


@dataclass
class RuntimeConfig:
    # Reference: main.py:151-187 (inference / misc / distributed)
    inference: bool = False
    inference_path: Optional[str] = None
    inference_output: Optional[str] = None
    save_interval: int = 5
    output_dir: str = ""
    seed: int = 42
    resume: str = ""
    start_epoch: int = 0
    eval: bool = False
    eval_bop: bool = False
    # Extension (deployment): serialize the fixed-shape inference program +
    # weights to a portable artifact (engine/serving.py:export_model)
    export_model: Optional[str] = None
    export_batch_size: int = 1
    export_image_size: tuple = (480, 640)
    export_platforms: tuple = ("cpu", "tpu")
    # TPU runtime (replaces world_size/dist_url/NCCL flags): the mesh shape.
    # data axis == data parallelism across all local + remote devices.
    mesh_data: int = -1             # -1: use all devices
    dtype: str = "float32"          # compute dtype for the transformer
    donate_step: bool = True        # donate TrainState buffers to the jitted step
    # Extension (absent in the reference, SURVEY §2.3): ZeRO-1 — shard the
    # AdamW moments across the data axis instead of replicating them
    # (parallel/zero.py). Params stay replicated; GSPMD emits the
    # reduce-scatter/all-gather schedule.
    zero_opt_state: bool = False
    # Extension: jax PRNG implementation for all keys (dropout masks etc.).
    # 'threefry2x32' (default) is jax's splittable reference generator;
    # 'rbg' runs ~10x cheaper on the TPU VPU — the train step spends
    # measurable time generating per-layer dropout masks over (B, S, C)
    # encoder activations. Different impls draw different (still
    # deterministic) streams, so this is a training-noise knob, not a
    # numerics change.
    rng_impl: str = "threefry2x32"
    # Extension (deployment): persistent XLA compilation cache directory for
    # the CLI (train/eval/inference). Serving always offers it
    # (engine/serving.py:enable_persistent_cache); here it makes restart and
    # preemption-resume skip the ~20-40 s train-step recompile.
    xla_cache_dir: Optional[str] = None


@dataclass
class PoETConfig:
    optim: OptimConfig = field(default_factory=OptimConfig)
    backbone: BackboneConfig = field(default_factory=BackboneConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    matcher: MatcherConfig = field(default_factory=MatcherConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    data: DataConfig = field(default_factory=DataConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "PoETConfig":
        kwargs = {}
        for f in dataclasses.fields(cls):
            sub = d.get(f.name, {})
            sub_cls = f.default_factory  # type: ignore[misc]
            sub_fields = {sf.name for sf in dataclasses.fields(sub_cls)}
            kwargs[f.name] = sub_cls(**{k: _tupled(v) for k, v in sub.items() if k in sub_fields})
        return cls(**kwargs)

    @classmethod
    def from_json(cls, s: str) -> "PoETConfig":
        return cls.from_dict(json.loads(s))


def _tupled(v):
    return tuple(v) if isinstance(v, list) else v
