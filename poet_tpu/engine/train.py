"""Training engine: optimizer param groups, jitted train step, epoch loop.

Parity targets:
  * param-group LRs — main.py:242-277: default lr for most params, lr_backbone
    for the detector (which is frozen -> effectively excluded, matching
    requires_grad=False at backbone_maskrcnn.py:49-52), lr * lr_linear_proj_mult
    for reference_points / sampling_offsets projections; AdamW or SGD(0.9).
  * StepLR(lr_drop) — main.py:278, applied per-epoch.
  * grad clipping by global norm (clip_max_norm) — engine.py:77-80.
  * calibrate mode (freeze all but aleatoric heads) — main.py:337-347.

TPU-native design: the ENTIRE step — forward, Hungarian matching, all aux
losses, backward, clip, optimizer update — is one jitted XLA program over the
data-parallel mesh; gradient reduction is compiler-inserted psum (replaces DDP
+ NCCL, main.py:280-283). The loss NaN-guard (engine.py:70-73) runs on the
host from the returned metrics without forcing an extra sync (metrics are
fetched anyway for logging).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from poet_tpu.config import PoETConfig
from poet_tpu.models import criterion as crit
from poet_tpu.models.matcher import match_poses


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray           # scalar int32


# ---------------------------------------------------------------------------
# Optimizer with reference param groups
# ---------------------------------------------------------------------------

def label_params(params, cfg: PoETConfig) -> Any:
    """Assign each parameter one of {main, linear_proj, backbone, frozen}.

    Mirrors main.py:242-271's name-keyword matching over a flax param tree.
    The detector backbone is 'frozen' (reference: requires_grad_(False));
    calibrate mode freezes everything except the aleatoric heads
    (main.py:337-347).
    """

    def label_of(path: str) -> str:
        if cfg.model.calibrate:
            return "main" if "aleatoric" in path else "frozen"
        if "backbone" in path:
            return "frozen"
        if any(k in path for k in cfg.optim.lr_linear_proj_names):
            return "linear_proj"
        return "main"

    flat = jax.tree_util.tree_map_with_path(
        lambda p, _: label_of(jax.tree_util.keystr(p)), params
    )
    return flat


def make_lr_schedule(base_lr: float, lr_drop_epochs: int, steps_per_epoch: int):
    """StepLR equivalent: lr * 0.1^(epoch // lr_drop). Parity: main.py:278."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * (0.1 ** (epoch // lr_drop_epochs))

    return schedule


def make_optimizer(cfg: PoETConfig, params, steps_per_epoch: int) -> optax.GradientTransformation:
    o = cfg.optim

    # Under MultiSteps the inner transform's count advances once per
    # grad_accum_steps micro-batches, so its schedule must be sized in
    # UPDATES per epoch, not micro-batches — otherwise the StepLR drop
    # fires grad_accum_steps x too late.
    updates_per_epoch = max(1, steps_per_epoch // max(o.grad_accum_steps, 1))

    def tx_for(lr_scale: float):
        sched = make_lr_schedule(o.lr * lr_scale, o.lr_drop, updates_per_epoch)
        if o.sgd:
            inner = optax.chain(
                optax.add_decayed_weights(o.weight_decay),
                optax.sgd(learning_rate=sched, momentum=0.9),
            )
        else:
            inner = optax.adamw(
                learning_rate=sched, weight_decay=o.weight_decay,
                # Extension: bf16 first moment halves its memory (the second
                # moment stays f32 — its dynamic range drives the update
                # scale). Composes with ZeRO-1 sharding (parallel/zero.py).
                mu_dtype=jnp.bfloat16 if o.mu_bf16 else None,
            )
        return inner

    transforms = {
        "main": tx_for(1.0),
        "linear_proj": tx_for(o.lr_linear_proj_mult),
        # Parity note: backbone params always label 'frozen' (label_params),
        # exactly like the reference, whose Joiner raises on train_backbone
        # (backbone.py:36-40) so its lr_backbone group is always empty too.
        # This group exists for the day backbone training is enabled.
        "backbone": tx_for(o.lr_backbone / o.lr),
        "frozen": optax.set_to_zero(),
    }
    labels = label_params(params, cfg)
    tx = optax.multi_transform(transforms, labels)
    if o.clip_max_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(o.clip_max_norm), tx)
    if o.grad_accum_steps > 1:
        # average grads over N micro-batches per update (extension — the
        # reference has no gradient accumulation, SURVEY §2.3); clipping
        # applies to the accumulated mean, matching large-batch semantics.
        tx = optax.MultiSteps(tx, every_k_schedule=o.grad_accum_steps)
    return tx


# ---------------------------------------------------------------------------
# Train / eval steps
# ---------------------------------------------------------------------------

def make_loss_fn(model, cfg: PoETConfig) -> Callable:
    mcfg = cfg.model
    # bf16 configs: cast the bf16-compute weight subtree ONCE at the top of
    # the step instead of letting flax convert each kernel at use site.
    # Bit-identical (the module would produce the same bf16 value from the
    # f32 leaf; f32 islands — offsets/heads/embeds — stay f32), but the
    # casts hoist OUT of the rematerialized encoder layers (which otherwise
    # re-convert their kernels during the backward re-forward) and group
    # into one pass XLA can schedule once. Master params, grads, and the
    # optimizer stay f32 — the cast's vjp converts cotangents back.
    pre_cast = mcfg.dtype == "bfloat16"

    def loss_fn(params, images, pad_mask, targets, dropout_rng):
        if pre_cast:
            from poet_tpu.utils.params import cast_params_for_inference

            params = cast_params_for_inference(params)
        outputs = model.apply(
            params, images, pad_mask, targets,
            deterministic=False,
            rngs={"dropout": dropout_rng},
        )
        match = match_poses(
            outputs["pred_boxes"], outputs["pred_classes"],
            targets["boxes"], targets["labels"],
            outputs["n_boxes"], targets["n_boxes"],
            bbox_mode=mcfg.bbox_mode,
            class_mode=mcfg.class_mode,
            cost_bbox=cfg.matcher.set_cost_bbox,
            cost_class=cfg.matcher.set_cost_class,
            giou_thresh=cfg.matcher.giou_thresh,
        )
        losses = crit.compute_losses(
            outputs, targets, match,
            rotation_mode=mcfg.rotation_representation,
            aleatoric=mcfg.aleatoric,
        )
        total = crit.weighted_total(
            losses, cfg.loss.translation_loss_coef, cfg.loss.rotation_loss_coef
        )
        return total, losses

    return loss_fn


def make_train_step(model, cfg: PoETConfig, tx: optax.GradientTransformation, donate: bool = True):
    """One fully-jitted training step (fwd + match + losses + bwd + update).

    Gradients average across the data axis automatically: the loss normalizes
    by the GLOBAL matched count (criterion sums are over the full sharded
    batch), so XLA emits the psum — equivalent to DDP's gradient all-reduce.
    """
    loss_fn = make_loss_fn(model, cfg)

    def step(state: TrainState, images, pad_mask, targets, dropout_rng):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, images, pad_mask, targets, dropout_rng
        )
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["loss"] = total
        metrics["grad_norm"] = gnorm
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_forward(model, cfg: PoETConfig):
    """Jitted eval forward + final-layer matching (engine.py:119-141)."""
    mcfg = cfg.model
    pre_cast = mcfg.dtype == "bfloat16"

    def forward(params, images, pad_mask, targets):
        if pre_cast:
            # same hoisted weight cast as the train step (bit-identical;
            # eval during training receives the f32 master tree)
            from poet_tpu.utils.params import cast_params_for_inference

            params = cast_params_for_inference(params)
        outputs = model.apply(params, images, pad_mask, targets, deterministic=True)
        match = match_poses(
            outputs["pred_boxes"], outputs["pred_classes"],
            targets["boxes"], targets["labels"],
            outputs["n_boxes"], targets["n_boxes"],
            bbox_mode=mcfg.bbox_mode,
            class_mode=mcfg.class_mode,
            cost_bbox=cfg.matcher.set_cost_bbox,
            cost_class=cfg.matcher.set_cost_class,
            giou_thresh=cfg.matcher.giou_thresh,
        )
        return {
            "pred_translation": outputs["translations"][-1],
            "pred_rotation": outputs["rotations"][-1],
            "pred_boxes": outputs["pred_boxes"],
            "pred_classes": outputs["pred_classes"],
            "pred_scores": outputs["pred_scores"],
            "match_tgt_idx": match.tgt_idx,
            "match_valid": match.valid,
        }

    return jax.jit(forward)


def init_train_state(model, cfg: PoETConfig, tx, rng, sample_batch) -> TrainState:
    images, pad_mask, targets = sample_batch
    params = model.init(rng, images, pad_mask, targets)
    opt_state = tx.init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))
