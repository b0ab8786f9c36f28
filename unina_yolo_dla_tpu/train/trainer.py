"""Train state + jitted train/eval steps.

Replaces the reference's Ultralytics Trainer subclass machinery
(``trainer.py:138-195``, ``train.py:560-686``) with a functional JAX
training loop: an optax optimizer with warmup + cosine decay, optional EMA
(disabled for QAT, matching ``train.py:873``), BatchNorm statistic updates,
and a pure ``train_step`` that jit/pjits over a device mesh.

Recipe constants mirror the reference defaults: phase-1 SGD lr0=0.01,
momentum 0.937, weight decay 5e-4, 3 warmup epochs; phase-2 QAT lr0=1e-3,
no warmup (``train.py:848-866``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.config import ModelConfig
from ..ops.preprocess import ensure_normalized
from .losses import LossConfig, detection_loss


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr0: float = 0.01
    lrf: float = 0.01            # final LR fraction (cosine floor)
    momentum: float = 0.937
    weight_decay: float = 5e-4
    warmup_steps: int = 300
    total_steps: int = 10_000
    ema_decay: float = 0.9999
    use_ema: bool = True
    grad_clip_norm: float = 10.0
    batch_size: int = 16
    optimizer: str = "sgd"       # "sgd" | "adamw"


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any              # same tree as params (or params if no EMA)


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=tc.lr0 * 0.01,
        peak_value=tc.lr0,
        warmup_steps=max(tc.warmup_steps, 1),
        decay_steps=max(tc.total_steps, 2),
        end_value=tc.lr0 * tc.lrf,
    )
    if tc.optimizer == "adamw":
        opt = optax.adamw(schedule, weight_decay=tc.weight_decay)
    else:
        opt = optax.chain(
            optax.add_decayed_weights(tc.weight_decay),
            optax.sgd(schedule, momentum=tc.momentum, nesterov=True),
        )
    return optax.chain(optax.clip_by_global_norm(tc.grad_clip_norm), opt)


def create_train_state(
    variables: dict[str, Any],
    tx: optax.GradientTransformation,
    tc: TrainConfig,
) -> TrainState:
    # Copy all trees: the parallel step donates its input state, and donated
    # buffers must not alias the caller's `variables`.
    params = jax.tree.map(jnp.copy, variables["params"])
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=jax.tree.map(jnp.copy, variables.get("batch_stats", {})),
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if tc.use_ema else params,
    )


def make_train_step(
    model,
    cfg: ModelConfig,
    tx: optax.GradientTransformation,
    tc: TrainConfig,
    loss_cfg: LossConfig = LossConfig(),
    grid_sizes=None,
    extra_variables: dict[str, Any] | None = None,
) -> Callable[[TrainState, dict[str, jnp.ndarray]],
              tuple[TrainState, dict[str, jnp.ndarray]]]:
    """Returns a pure (state, batch) -> (state, metrics) step.

    ``batch``: images (B,H,W,3) uint8 RGB (normalised on device; float32
    accepted as already-normalised); boxes (B,G,4) xyxy px; labels (B,G)
    int32; mask (B,G) bool.

    ``extra_variables``: frozen collections threaded into apply — e.g. the
    calibrated ``quant`` amax collection during QAT fine-tuning (amax stays
    frozen after calibration, matching the reference recipe).
    """
    extra = extra_variables or {}

    def loss_fn(params, batch_stats, batch):
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats, **extra},
            ensure_normalized(batch["images"]), train=True,
            mutable=["batch_stats"])
        loss, aux = detection_loss(
            outputs, batch["boxes"], batch["labels"], batch["mask"],
            cfg, loss_cfg, grid_sizes)
        return loss, (aux, mutated["batch_stats"])

    def train_step(state: TrainState, batch):
        grads, (aux, new_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        if tc.use_ema:
            # warmup ramp (Ultralytics ModelEMA convention): effective
            # decay ~0 early so short runs track live params, asymptoting
            # to ema_decay
            step_f = state.step.astype(jnp.float32) + 1.0
            d = tc.ema_decay * (1.0 - jnp.exp(-step_f / 2000.0))
            new_ema = jax.tree.map(
                lambda e, p: e * d + p * (1.0 - d),
                state.ema_params, new_params)
        else:
            new_ema = new_params
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
        aux["grad_norm"] = optax.global_norm(grads)
        return new_state, aux

    return train_step


def make_eval_step(model, cfg: ModelConfig, loss_cfg: LossConfig = LossConfig(),
                   grid_sizes=None, use_ema: bool = True,
                   extra_variables: dict[str, Any] | None = None):
    extra = extra_variables or {}

    def eval_step(state: TrainState, batch):
        params = state.ema_params if use_ema else state.params
        outputs = model.apply(
            {"params": params, "batch_stats": state.batch_stats, **extra},
            ensure_normalized(batch["images"]), train=False)
        _, aux = detection_loss(
            outputs, batch["boxes"], batch["labels"], batch["mask"],
            cfg, loss_cfg, grid_sizes)
        return outputs, aux
    return eval_step
