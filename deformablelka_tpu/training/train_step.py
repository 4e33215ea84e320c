"""Functional training step (SGD-Nesterov, grad-clip, deep supervision).

Parity targets:
  d_lka_former_trainer_synapse.py:195-198 (SGD nesterov, momentum 0.99,
  lr 1e-2, weight decay 3e-5), :291-301 (grad-norm clip 12),
  :92-108 (deep-supervision loss), :437-452 (poly LR per epoch).
  2D trainer: SGD momentum 0.9, wd 1e-4, 0.4CE+0.6Dice, per-iter poly LR
  (trainer_MaxViT_deform_LKA.py:114-147).

The step is pure and jit/pjit-compatible; DP sharding comes from the
arguments' shardings (parallel/mesh.py) — XLA inserts gradient psums.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from deformablelka_tpu.training.losses import (
    dc_and_ce_loss, deep_supervision_loss, dice_ce_2d_loss)


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_sgd(lr_schedule, momentum=0.99, nesterov=True, weight_decay=3e-5,
             clip_norm=12.0):
    """SGD + nesterov momentum + decoupled-style weight decay (torch SGD
    weight_decay adds wd*param to the gradient) + global-norm clip."""
    chain = []
    if clip_norm is not None:
        chain.append(optax.clip_by_global_norm(clip_norm))
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.sgd(lr_schedule, momentum=momentum, nesterov=nesterov))
    return optax.chain(*chain)


def make_ranger(lr_schedule, weight_decay: float = 0.0,
                sync_period: int = 6, slow_step_size: float = 0.5):
    """Ranger = RAdam + Lookahead (reference training/optimizer/ranger.py,
    present but unused by the default trainers). Composed from optax
    primitives rather than ported."""
    fast = optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay
        else optax.identity(),
        optax.radam(lr_schedule))
    return optax.lookahead(fast, sync_period=sync_period,
                           slow_step_size=slow_step_size)


def make_train_step(apply_fn: Callable, tx: optax.GradientTransformation,
                    deep_supervision: bool = True,
                    loss_fn: Callable = dc_and_ce_loss):
    """Returns step(state, batch) -> (state, metrics). batch = {"image":
    (B, *S, C), "label": (B, *S) int}."""

    def loss_of(params, batch_stats, batch):
        from deformablelka_tpu.ops import deform_impl, train_impl
        variables = {"params": params}
        mutable = []
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        # Pin the deform impl for the training trace: the window/hybrid
        # custom-VJP paths crash the remote TPU compiler inside
        # value_and_grad (ops.deform_impl docstring); gather is exact
        # and compiles. Override with DLKA_DEFORM_IMPL_TRAIN.
        with deform_impl(train_impl()):
            out = (apply_fn(variables, batch["image"], mutable=mutable)
                   if mutable else apply_fn(variables, batch["image"]))
        new_stats = None
        if mutable:
            out, updated = out
            new_stats = updated.get("batch_stats")
        if deep_supervision:
            loss = deep_supervision_loss(out, batch["label"], loss_fn)
        else:
            loss = loss_fn(out, batch["label"])
        return loss, new_stats

    def step(state: TrainState, batch):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params, state.batch_stats, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        if new_stats is None:
            new_stats = state.batch_stats
        return TrainState(params, new_stats, opt_state,
                          state.step + 1), metrics

    return step


def init_train_state(variables, tx) -> TrainState:
    params = variables["params"]
    return TrainState(params=params,
                      batch_stats=variables.get("batch_stats"),
                      opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))
