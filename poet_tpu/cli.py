"""CLI — flag-compatible with the reference `main.py` (argparse surface
mirrors main.py:33-189), dispatching to the TPU-native engine.

Modes (main.py:319-410): train (default), --eval, --eval_bop, --inference,
--calibrate. Distributed flags (world_size / dist_url / NCCL) are replaced by
the mesh: all visible devices form the data axis; multi-host via
`jax.distributed.initialize()` when JAX_COORDINATOR is set.
"""

from __future__ import annotations

import argparse
import datetime
import json
import math
import os
import time
from pathlib import Path

import numpy as np

from poet_tpu.config import PoETConfig


def get_args_parser():
    p = argparse.ArgumentParser("Pose Estimation Transformer (TPU)", add_help=False)
    # Learning (main.py:38-50)
    p.add_argument("--lr", default=2e-4, type=float)
    p.add_argument("--lr_backbone_names", default=["backbone"], type=str, nargs="+")
    p.add_argument("--lr_backbone", default=2e-5, type=float)
    p.add_argument("--lr_linear_proj_names",
                   default=["reference_points", "sampling_offsets"], type=str, nargs="+")
    p.add_argument("--lr_linear_proj_mult", default=0.1, type=float)
    p.add_argument("--batch_size", default=16, type=int)
    p.add_argument("--eval_batch_size", default=16, type=int)
    p.add_argument("--weight_decay", default=1e-4, type=float)
    p.add_argument("--epochs", default=50, type=int)
    p.add_argument("--lr_drop", default=100, type=int)
    # parsed-but-unused in the reference too (main.py:48 — StepLR only ever
    # reads --lr_drop); accepted here for flag compatibility
    p.add_argument("--lr_drop_epochs", default=None, type=int, nargs="+")
    p.add_argument("--clip_max_norm", default=0.1, type=float)
    # Backbone (main.py:52-71)
    p.add_argument("--backbone", default="maskrcnn", type=str,
                   choices=["yolov4", "maskrcnn", "fasterrcnn"])
    p.add_argument("--backbone_cfg", default="", type=str)
    p.add_argument("--backbone_weights", default=None, type=str)
    p.add_argument("--backbone_conf_thresh", default=0.4, type=float)
    p.add_argument("--backbone_iou_thresh", default=0.5, type=float)
    p.add_argument("--backbone_agnostic_nms", action="store_true")
    p.add_argument("--post_nms_top_n", default=1000, type=int,
                   help="RPN proposals entering the RoI heads (torchvision "
                        "test-time default 1000); a serving knob")
    p.add_argument("--yolo_box_decode", default="u5", type=str,
                   choices=("u5", "darknet"),
                   help="yolov4 head decode: 'u5' = the reference wrapper's "
                        "PyTorch decode; 'darknet' = classic darknet "
                        "(cfg scale_x_y, exp-wh) for darknet-trained weights")
    p.add_argument("--encoder_min_stride", default=1, type=int,
                   help="drop backbone feature maps finer than this stride "
                        "from the transformer input (extension; detections "
                        "keep every scale; 1 = reference behavior)")
    p.add_argument("--position_embedding", default="sine", type=str,
                   choices=("sine", "learned"))
    p.add_argument("--position_embedding_scale", default=2 * math.pi, type=float)
    p.add_argument("--num_feature_levels", default=4, type=int)
    # parsed-but-unused in the reference too (DETR legacy: main.py:65-66 is
    # consumed by no model file) — kept for flag compatibility only.
    p.add_argument("--dilation", action="store_true")
    # PoET (main.py:73-83)
    p.add_argument("--bbox_mode", default="gt", type=str,
                   choices=("gt", "backbone", "jitter"))
    p.add_argument("--reference_points", default="bbox", type=str,
                   choices=("bbox", "learned"))
    p.add_argument("--query_embedding", default="bbox", type=str,
                   choices=("bbox", "learned"))
    p.add_argument("--rotation_representation", default="6d", type=str,
                   choices=("6d", "quat", "silho_quat"))
    p.add_argument("--class_mode", default="specific", type=str,
                   choices=("agnostic", "specific"))
    # Transformer (main.py:85-101)
    p.add_argument("--enc_layers", default=6, type=int)
    p.add_argument("--dec_layers", default=6, type=int)
    p.add_argument("--dim_feedforward", default=1024, type=int)
    p.add_argument("--hidden_dim", default=256, type=int)
    p.add_argument("--dropout", default=0.1, type=float)
    p.add_argument("--nheads", default=8, type=int)
    p.add_argument("--num_queries", default=10, type=int)
    p.add_argument("--dec_n_points", default=4, type=int)
    p.add_argument("--enc_n_points", default=4, type=int)
    # Uncertainty (main.py:103-105)
    p.add_argument("--aleatoric", action="store_true")
    p.add_argument("--calibrate", action="store_true")
    # Matcher (main.py:107-114)
    p.add_argument("--matcher_type", default="pose", choices=["pose"], type=str)
    p.add_argument("--set_cost_class", default=1, type=float)
    p.add_argument("--set_cost_bbox", default=1, type=float)
    p.add_argument("--set_cost_giou", default=2, type=float)
    # Loss (main.py:116-122)
    p.add_argument("--no_aux_loss", dest="aux_loss", action="store_false")
    p.add_argument("--translation_loss_coef", default=1, type=float)
    p.add_argument("--rotation_loss_coef", default=1, type=float)
    # Dataset (main.py:124-139)
    p.add_argument("--dataset", default="ycbv", type=str, choices=("ycbv", "lmo"))
    p.add_argument("--dataset_path", default="/data", type=str)
    p.add_argument("--train_set", default="train", type=str)
    p.add_argument("--eval_set", default="test", type=str)
    p.add_argument("--synt_background", default=None, type=str)
    p.add_argument("--n_classes", default=21, type=int)
    p.add_argument("--jitter_probability", default=0.5, type=float)
    p.add_argument("--rgb_augmentation", action="store_true")
    p.add_argument("--grayscale", action="store_true")
    # Evaluator (main.py:141-149)
    p.add_argument("--eval_interval", type=int, default=10)
    p.add_argument("--class_info", type=str, default="/annotations/classes.json")
    p.add_argument("--models", type=str, default="/models_eval/")
    p.add_argument("--model_symmetry", type=str, default="/annotations/symmetries.json")
    # Inference (main.py:151-157)
    p.add_argument("--inference", action="store_true")
    p.add_argument("--inference_path", type=str, default=None)
    p.add_argument("--inference_output", type=str, default=None)
    # Misc (main.py:159-174)
    p.add_argument("--sgd", action="store_true")
    p.add_argument("--save_interval", default=5, type=int)
    p.add_argument("--output_dir", default="")
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--resume", default="")
    p.add_argument("--start_epoch", default=0, type=int)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--eval_bop", action="store_true")
    p.add_argument("--export_model", default=None, type=str,
                   help="write a portable serving artifact (StableHLO + "
                        "weights) to this directory and exit — the TensorRT-"
                        "engine-build analogue; combine with --resume")
    p.add_argument("--export_batch_size", default=1, type=int)
    p.add_argument("--export_image_size", default=[480, 640], type=int, nargs=2)
    p.add_argument("--export_platforms", default=["cpu", "tpu"], type=str, nargs="+")
    p.add_argument("--num_workers", default=4, type=int)
    p.add_argument("--cache_mode", default=False, action="store_true")
    p.add_argument("--decoded_cache_mb", default=0, type=int,
                   help="decoded-image cache budget in MB (extension; 0=off):"
                        " epochs 2+ skip PNG/JPEG decode for cached images")
    # TPU runtime (replaces main.py:176-187 distributed flags)
    p.add_argument("--gpu", default=0, type=int,
                   help="accepted for reference-script compatibility and "
                        "ignored (CUDA per-process device rank, main.py:187; "
                        "the TPU runtime assigns devices via the mesh)")
    # The reference's torch.distributed plumbing (main.py:176-187). All six
    # are accepted-and-ignored so reference launch commands run unmodified:
    # process placement comes from the TPU runtime (one process per host) and
    # rendezvous from jax.distributed.initialize(); see MIGRATION.md.
    for flag, default in (("--device", "cuda"), ("--dist_backend", "nccl"),
                          ("--dist_url", "env://")):
        p.add_argument(flag, default=default, type=str,
                       help="accepted for reference-script compatibility and "
                            "ignored (torch.distributed plumbing; the mesh "
                            "runtime replaces it)")
    for flag in ("--world_size", "--local_rank"):
        p.add_argument(flag, default=None, type=int,
                       help="accepted for reference-script compatibility and "
                            "ignored (jax.process_count()/process_index() "
                            "are authoritative)")
    p.add_argument("--distributed", action="store_true",
                   help="accepted for reference-script compatibility and "
                        "ignored (multi-host turns on via "
                        "JAX_COORDINATOR_ADDRESS / the TPU pod runtime)")
    p.add_argument("--mesh_data", default=-1, type=int,
                   help="devices on the data axis (-1: all)")
    p.add_argument("--grad_accum_steps", default=1, type=int,
                   help="micro-batches averaged per optimizer update "
                        "(extension; effective batch = batch_size * this)")
    p.add_argument("--zero_opt_state", action="store_true",
                   help="ZeRO-1: shard AdamW moments across the data axis "
                        "(extension; params stay replicated)")
    p.add_argument("--mu_bf16", action="store_true",
                   help="bfloat16 AdamW first moment (extension; halves its "
                        "memory, second moment stays f32)")
    p.add_argument("--dtype", default="float32", type=str)
    p.add_argument("--enc_deform_impl", default=None, type=str,
                   choices=("auto", "sep", "fused", "mxu", "patch", "gather",
                            "sep_cv", "pallas"),
                   help="encoder deformable-sampling core (extension; "
                        "default = config.py enc_deform_impl)")
    p.add_argument("--dec_deform_impl", default=None, type=str,
                   choices=("auto", "sep", "fused", "mxu", "patch", "gather",
                            "sep_cv", "pallas"),
                   help="decoder cross-attention sampling core (extension; "
                        "auto = one-hot mxu, the on-chip A/B winner at "
                        "Q = num_queries)")
    p.add_argument("--enc_remat", default="auto", type=str,
                   choices=("auto", "on", "off"),
                   help="rematerialize encoder layers in the backward pass "
                        "(auto: on for one-hot/XLA sampling cores, off for "
                        "'fused' whose custom VJP keeps residuals small)")
    p.add_argument("--rng_impl", default="threefry2x32", type=str,
                   choices=("threefry2x32", "rbg"),
                   help="jax PRNG implementation (extension; 'rbg' generates "
                        "dropout masks ~10x cheaper on the TPU VPU)")
    p.add_argument("--profile_dir", default=None, type=str,
                   help="write a jax.profiler trace of the first train epoch here")
    p.add_argument("--xla_cache_dir", default=None, type=str,
                   help="persistent XLA compilation cache dir (extension): "
                        "restarts and preemption resumes skip recompilation")
    return p


def args_to_config(args) -> PoETConfig:
    cfg = PoETConfig()
    o, b, m, mt, l, d, e, r = (cfg.optim, cfg.backbone, cfg.model, cfg.matcher,
                               cfg.loss, cfg.data, cfg.eval, cfg.runtime)
    for k in ("lr", "lr_backbone", "lr_linear_proj_mult", "batch_size",
              "eval_batch_size", "weight_decay", "epochs", "lr_drop",
              "clip_max_norm", "sgd", "grad_accum_steps", "mu_bf16"):
        setattr(o, k, getattr(args, k))
    o.lr_backbone_names = tuple(args.lr_backbone_names)
    o.lr_linear_proj_names = tuple(args.lr_linear_proj_names)
    b.name = args.backbone
    b.cfg_path = args.backbone_cfg
    b.weights = args.backbone_weights
    b.conf_thresh = args.backbone_conf_thresh
    b.iou_thresh = args.backbone_iou_thresh
    b.agnostic_nms = args.backbone_agnostic_nms
    b.post_nms_top_n = args.post_nms_top_n
    b.encoder_min_stride = args.encoder_min_stride
    b.yolo_box_decode = args.yolo_box_decode
    b.position_embedding = args.position_embedding
    b.position_embedding_scale = args.position_embedding_scale
    for k in ("bbox_mode", "reference_points", "query_embedding",
              "rotation_representation", "class_mode", "enc_layers", "dec_layers",
              "dim_feedforward", "hidden_dim", "dropout", "nheads", "num_queries",
              "dec_n_points", "enc_n_points", "aleatoric", "calibrate",
              "aux_loss", "n_classes", "num_feature_levels"):
        setattr(m, k, getattr(args, k))
    mt.matcher_type = args.matcher_type
    mt.set_cost_class = args.set_cost_class
    mt.set_cost_bbox = args.set_cost_bbox
    mt.set_cost_giou = args.set_cost_giou
    l.translation_loss_coef = args.translation_loss_coef
    l.rotation_loss_coef = args.rotation_loss_coef
    for k in ("dataset", "dataset_path", "train_set", "eval_set", "synt_background",
              "jitter_probability", "rgb_augmentation", "grayscale", "num_workers",
              "cache_mode", "decoded_cache_mb"):
        setattr(d, k, getattr(args, k))
    e.eval_interval = args.eval_interval
    e.class_info = args.class_info
    e.models_path = args.models
    e.model_symmetry = args.model_symmetry
    for k in ("inference", "inference_path", "inference_output", "save_interval",
              "output_dir", "seed", "resume", "start_epoch", "eval", "eval_bop",
              "mesh_data", "dtype", "zero_opt_state", "rng_impl",
              "export_model", "export_batch_size", "xla_cache_dir"):
        setattr(r, k, getattr(args, k))
    r.export_image_size = tuple(args.export_image_size)
    r.export_platforms = tuple(args.export_platforms)
    m.dtype = args.dtype
    if getattr(args, "enc_deform_impl", None):
        m.enc_deform_impl = args.enc_deform_impl
    if getattr(args, "dec_deform_impl", None):
        m.dec_deform_impl = args.dec_deform_impl
    m.enc_remat = getattr(args, "enc_remat", "auto")
    cfg.profile_dir = getattr(args, "profile_dir", None)
    return cfg


def main(cfg: PoETConfig):
    import jax
    import jax.numpy as jnp
    
    from poet_tpu.data.dataset import build_dataset
    from poet_tpu.data.loader import PoseDataLoader
    from poet_tpu.engine.checkpoint import (
        checkpoint_paths_for_epoch, load_checkpoint, merge_params, save_checkpoint,
    )
    from poet_tpu.engine.evaluate import bop_evaluate, pose_evaluate
    from poet_tpu.engine.inference import inference
    from poet_tpu.engine.metrics import MetricLogger, SmoothedValue
    from poet_tpu.engine.train import TrainState, make_optimizer, make_train_step
    from poet_tpu.evaluation.pose_evaluator import build_pose_evaluator
    from poet_tpu.models import build_model
    from poet_tpu.parallel.mesh import create_mesh, replicate, shard_batch

    # multi-host rendezvous (replaces launch_distributed.py + NCCL env://):
    # the TPU runtime provides one process per host; initialize() wires them.
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()

    if cfg.runtime.rng_impl != "threefry2x32":
        jax.config.update("jax_default_prng_impl", cfg.runtime.rng_impl)

    if cfg.runtime.xla_cache_dir:
        from poet_tpu.engine.serving import enable_persistent_cache
        enable_persistent_cache(cfg.runtime.xla_cache_dir)

    # seed (main.py:198-202; per-process offset)
    seed = cfg.runtime.seed + jax.process_index()
    np.random.seed(seed)

    n_dev = len(jax.devices()) if cfg.runtime.mesh_data == -1 else cfg.runtime.mesh_data
    # the data axis must divide every batch; shrink to the gcd if needed
    n_data = math.gcd(n_dev, math.gcd(cfg.optim.batch_size, cfg.optim.eval_batch_size))
    if n_data != n_dev:
        print(f"mesh: shrinking data axis {n_dev} -> {n_data} to divide batch sizes")
    mesh = create_mesh(n_data)
    is_main = jax.process_index() == 0

    model = build_model(cfg)
    output_dir = Path(cfg.runtime.output_dir) if cfg.runtime.output_dir else None
    if output_dir:
        output_dir.mkdir(parents=True, exist_ok=True)

    # datasets + loaders
    def make_loader(split, batch_size, shuffle):
        ds = build_dataset(split, cfg)
        return PoseDataLoader(
            ds, batch_size=batch_size, num_queries=cfg.model.num_queries,
            shuffle=shuffle, drop_last=shuffle, seed=cfg.runtime.seed,
            process_index=jax.process_index(), process_count=jax.process_count(),
            num_workers=cfg.data.num_workers or 4,
            with_jitter=(cfg.model.bbox_mode == "jitter"),
            device_put_fn=lambda b: shard_batch(b, mesh),
            pad_to_full_batch=not shuffle,
        )

    if cfg.runtime.inference:
        return inference(model, None, cfg)

    loader_val = make_loader(cfg.data.eval_set, cfg.optim.eval_batch_size, False)

    # init model params from one sample batch
    sample = next(iter(loader_val.epoch(0)))
    images, pad_mask, targets = sample
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), images, pad_mask, targets)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print("number of params:", n_params)

    # detector checkpoint (parity: build-time load, backbone_maskrcnn.py:138-149)
    if cfg.backbone.weights:
        from poet_tpu.utils.torch_import import load_backbone_weights

        params, bb_missing, bb_unexpected = load_backbone_weights(
            params, cfg.backbone.weights, darknet_cfg=cfg.backbone.cfg_path)
        print(f"Loaded backbone weights from {cfg.backbone.weights}")
        if bb_missing:
            print("Backbone missing keys:", bb_missing)
        if bb_unexpected:
            print("Backbone unexpected keys:", bb_unexpected)

    resume_payload = None
    if cfg.runtime.resume:
        # orbax dir, reference zoo .pth/.npz, or a URL to either
        # (parity: main.py:288-298 incl. https checkpoints)
        from poet_tpu.engine.checkpoint import load_resume

        resume_payload, start_epoch = load_resume(
            cfg.runtime.resume, cfg.model.enc_layers, cfg.model.dec_layers,
            cfg.model.nheads, cfg.model.aleatoric)
        params, missing, unexpected = merge_params(params, resume_payload["params"])
        if missing:
            print("Missing Keys:", missing)
        if unexpected:
            print("Unexpected Keys:", unexpected)
        if not cfg.runtime.eval:
            cfg.runtime.start_epoch = start_epoch

    if cfg.runtime.export_model:
        # deployment step (the trtexec analogue): serialize the fixed-shape
        # inference program + weights to a portable artifact that
        # ExportedPoseServer runs WITHOUT model code
        from poet_tpu.engine.serving import export_model

        path = export_model(
            cfg, params, cfg.runtime.export_model,
            batch_size=cfg.runtime.export_batch_size,
            image_size=tuple(cfg.runtime.export_image_size),
            platforms=tuple(cfg.runtime.export_platforms),
        )
        print(f"Exported serving artifact to {path}")
        return path

    if cfg.runtime.eval or cfg.runtime.eval_bop:
        evaluator = build_pose_evaluator(cfg)
        if cfg.runtime.eval:
            return pose_evaluate(model, params, evaluator, loader_val, cfg,
                                 cfg.data.eval_set)
        return bop_evaluate(model, params, loader_val, cfg, cfg.data.eval_set)

    # ---- training
    loader_train = make_loader(cfg.data.train_set, cfg.optim.batch_size, True)
    evaluator = build_pose_evaluator(cfg)
    steps_per_epoch = loader_train.steps_per_epoch()
    tx = make_optimizer(cfg, params, steps_per_epoch)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    if resume_payload is not None and "opt_state" in resume_payload:
        # restore optimizer state + step into the exact pytree structure
        # (parity: main.py:299-317 — note the reference hack to keep CLI LRs
        # over checkpointed ones is unnecessary here: our LR lives in the
        # schedule, rebuilt from the CLI config every run)
        payload, _ = load_checkpoint(
            cfg.runtime.resume,
            template={"params": state.params, "opt_state": state.opt_state,
                      "step": 0, "epoch": 0},
        )
        state = TrainState(params=state.params, opt_state=payload["opt_state"],
                           step=jnp.asarray(payload["step"], jnp.int32))
    state = replicate(state, mesh)
    if cfg.runtime.zero_opt_state and mesh.shape["data"] > 1:
        # ZeRO-1 (extension): reshard the AdamW moments across the data axis;
        # GSPMD keeps them sharded through every train step.
        from poet_tpu.parallel.zero import zero1_opt_state_shardings

        opt_shardings = zero1_opt_state_shardings(tx, state.params, mesh)
        state = TrainState(
            params=state.params,
            opt_state=jax.device_put(state.opt_state, opt_shardings),
            step=state.step,
        )
    step_fn = make_train_step(model, cfg, tx, donate=cfg.runtime.donate_step)

    print("Start training")

    # Preemption-safe training (extension — the reference has no preemption
    # handling, SURVEY §5): preemptible TPU VMs receive SIGTERM before
    # shutdown. Catch it, finish the in-flight step, write the rolling
    # checkpoint mid-epoch, and exit 0 so the job resumes with --resume from
    # (at most) one epoch of lost progress minus the steps already taken.
    import signal

    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        preempted["flag"] = True
        print("SIGTERM received — checkpointing at the next step boundary")

    try:
        prev_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:                      # non-main thread (tests)
        prev_sigterm = None

    # tracing/profiling hook (SURVEY §5: the reference has only wall-clock
    # prints; here the first epoch can emit a full jax.profiler trace)
    profile_dir = getattr(cfg, "profile_dir", None)
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    start_time = time.time()
    rng = jax.random.PRNGKey(seed)
    from poet_tpu.engine.train import make_lr_schedule

    lr_schedule = make_lr_schedule(cfg.optim.lr, cfg.optim.lr_drop, steps_per_epoch)
    # host mirror of state.step (increments by 1 per step_fn call): reading
    # int(state.step) each step would sync on the just-dispatched update
    host_step = int(state.step)
    for epoch in range(cfg.runtime.start_epoch, cfg.optim.epochs):
        logger = MetricLogger()
        logger.add_meter("lr", SmoothedValue(1, "{value:.6f}"))
        header = f"Epoch: [{epoch}]"

        def consume_metrics(m, step_idx):
            loss = float(m["loss"])
            if not math.isfinite(loss):
                print(f"Loss is {loss}, stopping training")
                print({k: float(v) for k, v in m.items()})
                raise SystemExit(1)
            # live lr (reference logs it per epoch, engine.py:47-48,85)
            logger.update(lr=float(lr_schedule(step_idx)))
            logger.update(**{k: float(v) for k, v in m.items()})

        # one-step-deep pipeline: dispatch step k+1 before reading step k's
        # metrics so host logging overlaps device compute (the reference
        # syncs per step at engine.py:68; the NaN gate here fires one step
        # later, which changes nothing — checkpoints are per-epoch)
        pending = None
        for images, pad_mask, targets in logger.log_every(
            loader_train.epoch(epoch), 10, header
        ):
            rng, drng = jax.random.split(rng)
            state, metrics = step_fn(state, images, pad_mask, targets, drng)
            if pending is not None:
                consume_metrics(*pending)
            pending = (metrics, host_step)
            host_step += 1
            if preempted["flag"]:
                # sync the in-flight step first: the NaN gate must fire
                # BEFORE the rolling checkpoint can be overwritten with a
                # non-finite update
                consume_metrics(*pending)
                pending = None
                if output_dir and is_main:
                    save_checkpoint(str(output_dir), "checkpoint", state,
                                    epoch - 1, cfg)
                print(f"preempted at epoch {epoch} step {host_step}: "
                      "checkpoint written, exiting cleanly")
                if prev_sigterm is not None:
                    signal.signal(signal.SIGTERM, prev_sigterm)
                return
        if pending is not None:
            consume_metrics(*pending)
        logger.synchronize_between_processes()
        print("Averaged stats:", logger)
        if profile_dir and epoch == cfg.runtime.start_epoch:
            jax.profiler.stop_trace()
            profile_dir = None

        if output_dir and is_main:
            for name in checkpoint_paths_for_epoch(str(output_dir), epoch, cfg):
                save_checkpoint(str(output_dir), name, state, epoch, cfg)

        if epoch % cfg.eval.eval_interval == 0:
            pose_evaluate(model, state.params, evaluator, loader_val, cfg,
                          cfg.data.eval_set, epoch)

        if output_dir and is_main:
            log_stats = {f"train_{k}": m.global_avg for k, m in logger.meters.items()}
            log_stats.update(epoch=epoch, n_parameters=n_params)
            with (output_dir / "log.txt").open("a") as f:
                f.write(json.dumps(log_stats) + "\n")

    total = time.time() - start_time
    print("Training time", str(datetime.timedelta(seconds=int(total))))
    print("Evaluate final trained model")
    pose_evaluate(model, state.params, evaluator, loader_val, cfg, cfg.data.eval_set)


def _warn_ignored_distributed_flags(args):
    """One-line notice when a reference torch-distributed flag is set to a
    non-default value — the flags are accepted for drop-in compatibility but
    have no effect (the device mesh replaces the process group)."""
    defaults = {"gpu": 0, "device": "cuda", "dist_backend": "nccl",
                "dist_url": "env://", "world_size": None, "local_rank": None,
                "distributed": False}
    set_flags = [f"--{k}" for k, d in defaults.items()
                 if getattr(args, k, d) != d]
    if set_flags:
        import jax

        print(f"note: {', '.join(set_flags)} ignored (torch-distributed "
              f"compat flags); using the {len(jax.devices())}-device mesh")


def run():
    parser = argparse.ArgumentParser(
        "PoET training and evaluation script", parents=[get_args_parser()]
    )
    args = parser.parse_args()
    _warn_ignored_distributed_flags(args)
    cfg = args_to_config(args)
    if cfg.runtime.output_dir:
        Path(cfg.runtime.output_dir).mkdir(parents=True, exist_ok=True)
    if cfg.runtime.inference:
        cfg.model.bbox_mode = "backbone"  # main.py:407
    main(cfg)


if __name__ == "__main__":
    run()
