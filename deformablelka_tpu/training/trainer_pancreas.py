"""NIH-Pancreas trainer: CE + binary soft dice, SGD with step-decay LR.

Reference behaviour (re-derived):
  /root/reference/3D/pancreas_code/train_pancreas.py:106-191
    D_LKA_Net 96³ / patch (2,2,2), do_ds=False; SGD lr 0.01 momentum 0.9
    weight-decay 1e-4; loss = CE(full label) + dice_loss(softmax[:,1],
    label==1) on the labeled slice of the batch (labeled_bs); LR ×0.1 at
    every 2500 iterations; 6000 iterations total; final checkpoint
    `d_lka_former_iter_6000.pth`.
  /root/reference/3D/pancreas_code/utils/losses.py:5-13
    dice_loss: 1 - (2·Σ(s·t)+ε)/(Σs²+Σt²+ε), ε=1e-5.

TPU-first: one jitted train step (bf16 matmuls inside the model, fp32
loss), LR schedule folded into the optax chain so the step never retraces;
data-parallel over a mesh by sharding the batch dim (parallel/mesh.py).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from deformablelka_tpu.training.train_step import TrainState, init_train_state
from deformablelka_tpu.training.checkpoint import CheckpointManager


def binary_dice_loss(score, target, smooth=1e-5):
    """losses.py:5-13 (squared-denominator soft dice on probabilities)."""
    target = target.astype(score.dtype)
    intersect = jnp.sum(score * target)
    y_sum = jnp.sum(target * target)
    z_sum = jnp.sum(score * score)
    return 1.0 - (2 * intersect + smooth) / (z_sum + y_sum + smooth)


def pancreas_loss(logits, labels, labeled_bs: Optional[int] = None):
    """CE + dice-on-class-1, computed on the first `labeled_bs` samples
    (train_pancreas.py:151-155; labeled_bs=None uses the whole batch)."""
    if labeled_bs is not None:
        logits = logits[:labeled_bs]
        labels = labels[:labeled_bs]
    logits = logits.astype(jnp.float32)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits, labels).mean()
    probs = jax.nn.softmax(logits, axis=-1)
    dl = binary_dice_loss(probs[..., 1], labels == 1)
    return ce + dl, (ce, dl)


def make_step_decay_schedule(base_lr: float = 0.01, decay_every: int = 2500,
                             factor: float = 0.1):
    return optax.piecewise_constant_schedule(
        base_lr, {decay_every: factor, 2 * decay_every: factor,
                  3 * decay_every: factor})


class TrainerPancreas:
    """Iteration-driven engine (train_pancreas.py:138-191)."""

    def __init__(self, model, out_dir: str, base_lr: float = 0.01,
                 max_iterations: int = 6000, batch_size: int = 2,
                 labeled_bs: Optional[int] = None, seed: int = 1337):
        self.model = model
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.max_iterations = max_iterations
        self.batch_size = batch_size
        self.labeled_bs = labeled_bs
        self.seed = seed
        self.tx = optax.chain(
            optax.add_decayed_weights(1e-4),
            optax.sgd(make_step_decay_schedule(base_lr), momentum=0.9,
                      nesterov=False))
        self._step = None
        self.state = None

    def initialize(self, example_batch):
        rng = jax.random.PRNGKey(self.seed)
        variables = self.model.init(rng, jnp.asarray(example_batch["data"]))
        self.state = init_train_state(variables, self.tx)

        model, tx, labeled_bs = self.model, self.tx, self.labeled_bs

        @jax.jit
        def step(state: TrainState, data, target):
            def loss_of(params, batch_stats):
                variables = {"params": params}
                mutable = []
                if batch_stats is not None:
                    variables["batch_stats"] = batch_stats
                    mutable = ["batch_stats"]
                from deformablelka_tpu.ops import deform_impl, train_impl
                with deform_impl(train_impl()):
                    out = (model.apply(variables, data, mutable=mutable)
                           if mutable else model.apply(variables, data))
                new_stats = None
                if mutable:
                    out, updated = out
                    new_stats = updated.get("batch_stats")
                if isinstance(out, (list, tuple)):
                    out = out[0]
                loss, (ce, dl) = pancreas_loss(out, target, labeled_bs)
                return loss, (ce, dl, new_stats)

            (loss, (ce, dl, new_stats)), grads = jax.value_and_grad(
                loss_of, has_aux=True)(state.params, state.batch_stats)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            if new_stats is None:
                new_stats = state.batch_stats
            return (TrainState(params, new_stats, opt_state,
                               state.step + 1),
                    {"loss": loss, "loss_seg": ce, "loss_seg_dice": dl})

        self._step = step

    def run_training(self, loader, log_every: int = 50,
                     callback: Optional[Callable] = None):
        if self.state is None:
            self.initialize(loader.next_batch())
        it = 0
        t0 = time.time()
        while it < self.max_iterations:
            batch = loader.next_batch()
            self.state, metrics = self._step(
                self.state, jnp.asarray(batch["data"]),
                jnp.asarray(batch["target"]))
            it += 1
            if log_every and it % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                print(f"iteration: {it} Total loss : {m['loss']:.4f} "
                      f"CE loss : {m['loss_seg']:.4f} "
                      f"Dice loss : {m['loss_seg_dice']:.4f} "
                      f"({(time.time()-t0)/it:.2f}s/it)")
            if callback is not None:
                callback(it, self.state, metrics)
        self.save_checkpoint(f"d_lka_former_iter_{self.max_iterations}")
        return self.state

    def save_checkpoint(self, name: str):
        mgr = CheckpointManager(self.out_dir)
        ckpt = {"params": self.state.params, "step": int(self.state.step)}
        if self.state.batch_stats is not None:
            ckpt["batch_stats"] = self.state.batch_stats
        mgr.save(name, ckpt)
        mgr.wait_until_finished()
