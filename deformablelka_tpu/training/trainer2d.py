"""2D trainer — Synapse slice training engine.

Parity targets: 2D/trainer_MaxViT_deform_LKA.py:72-213 —
  SGD momentum 0.9 wd 1e-4 (:114), loss 0.4·CE + 0.6·Dice (:137-139),
  per-ITERATION poly LR `base_lr·(1-it/max_it)^0.9` (:145-147), batch 24,
  max_epochs 400, eval every `eval_interval` epochs after half the run
  (:179-191), checkpoints as bare params (.pth analog).
Skin variant (train_skin_2017.py:102-152): BCE-with-logits, SGD +
  ReduceLROnPlateau(0.5, patience 10), best-val-loss checkpointing.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from deformablelka_tpu.training.losses import dice_ce_2d_loss
from deformablelka_tpu.training.train_step import (
    TrainState, init_train_state)
from deformablelka_tpu.training.checkpoint import CheckpointManager

log = logging.getLogger("deformablelka_tpu.trainer2d")


def bce_with_logits(logits, labels):
    """Binary path for the skin pipeline; logits (B, H, W, 1),
    labels (B, H, W) ∈ {0,1}."""
    l = logits[..., 0].astype(jnp.float32)
    y = labels.astype(jnp.float32)
    return jnp.mean(jnp.maximum(l, 0) - l * y + jnp.log1p(jnp.exp(-jnp.abs(l))))


class Trainer2D:
    def __init__(self, model, output_folder, train_gen,
                 base_lr=0.05, momentum=0.9, weight_decay=1e-4,
                 max_epochs=400, iterations_per_epoch=None,
                 loss_fn: Callable = dice_ce_2d_loss,
                 eval_hook: Optional[Callable] = None,
                 eval_interval: int = 20,
                 tensorboard_dir: Optional[str] = None):
        self.model = model
        self.output_folder = Path(output_folder)
        self.output_folder.mkdir(parents=True, exist_ok=True)
        self.train_gen = train_gen
        self.base_lr = base_lr
        self.momentum = momentum
        self.weight_decay = weight_decay
        self.max_epochs = max_epochs
        self.iterations_per_epoch = iterations_per_epoch
        self.loss_fn = loss_fn
        self.eval_hook = eval_hook
        self.eval_interval = eval_interval
        self.ckpt = CheckpointManager(self.output_folder / "ckpt")
        self.epoch = 0
        self.losses = []
        self.state = None
        self._step_fn = None
        # tensorboardX scalars + image panels
        # (trainer_MaxViT_deform_LKA.py:116,150-174)
        self._tb = None
        if tensorboard_dir is not None:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(str(tensorboard_dir))
            except ImportError:  # pragma: no cover - baked in here
                log.warning("tensorboardX unavailable; TB logging off")
        self._iter = 0

    def _max_iterations(self):
        return self.max_epochs * self.iterations_per_epoch

    def initialize(self, example_batch):
        max_it = self._max_iterations()

        def schedule(count):
            frac = jnp.minimum(count / max_it, 1.0)
            return self.base_lr * (1.0 - frac) ** 0.9

        self.tx = optax.chain(
            optax.add_decayed_weights(self.weight_decay),
            optax.sgd(schedule, momentum=self.momentum))
        variables = self.model.init(jax.random.PRNGKey(1234), jnp.asarray(
            example_batch["image"][:1]))
        self.state = init_train_state(variables, self.tx)

        loss_fn = self.loss_fn

        def loss_of(params, batch_stats, batch):
            variables = {"params": params}
            mutable = []
            if batch_stats:
                variables["batch_stats"] = batch_stats
                mutable = ["batch_stats"]
            from deformablelka_tpu.ops import deform_impl, train_impl
            with deform_impl(train_impl()):  # ops.deform_impl docstring
                out = (self.model.apply(variables, batch["image"],
                                        mutable=mutable)
                       if mutable else
                       self.model.apply(variables, batch["image"]))
            new_stats = None
            if mutable:
                out, upd = out
                new_stats = upd.get("batch_stats")
            return loss_fn(out, batch["label"]), new_stats

        def step(state, batch):
            (loss, new_stats), grads = jax.value_and_grad(
                loss_of, has_aux=True)(state.params, state.batch_stats,
                                       batch)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            if new_stats is None:
                new_stats = state.batch_stats
            return TrainState(params, new_stats, opt_state,
                              state.step + 1), {"loss": loss}

        self._step_fn = jax.jit(step)

    def run_training(self):
        if self.state is None:
            first = self.train_gen.next()
            if self.iterations_per_epoch is None:
                self.iterations_per_epoch = getattr(
                    self.train_gen, "num_batches", 100)
            self.initialize(first)
        while self.epoch < self.max_epochs:
            t0 = time.time()
            ep_losses = []
            for _ in range(self.iterations_per_epoch):
                batch = self.train_gen.next()
                dev = {"image": jnp.asarray(batch["image"], jnp.float32),
                       "label": jnp.asarray(batch["label"], jnp.int32)}
                self.state, m = self._step_fn(self.state, dev)
                ep_losses.append(float(m["loss"]))
                self._iter += 1
                if self._tb is not None:
                    frac = min(self._iter / self._max_iterations(), 1.0)
                    self._tb.add_scalar(
                        "info/lr", self.base_lr * (1 - frac) ** 0.9,
                        self._iter)
                    self._tb.add_scalar("info/total_loss",
                                        float(m["loss"]), self._iter)
                    if self._iter % 20 == 0:
                        img = np.asarray(dev["image"][0])
                        img = (img - img.min()) / max(
                            float(img.max() - img.min()), 1e-8)
                        self._tb.add_image(
                            "train/Image", img.mean(-1, keepdims=True),
                            self._iter, dataformats="HWC")
                        pred = np.asarray(
                            self.model.apply(
                                {"params": self.state.params,
                                 **({"batch_stats":
                                     self.state.batch_stats}
                                    if self.state.batch_stats else {})},
                                dev["image"][:1]).argmax(-1))[0]
                        self._tb.add_image(
                            "train/Prediction",
                            (pred[..., None] * 50).astype(np.uint8),
                            self._iter, dataformats="HWC")
                        gt = np.asarray(dev["label"][0])
                        self._tb.add_image(
                            "train/GroundTruth",
                            (gt[..., None] * 50).astype(np.uint8),
                            self._iter, dataformats="HWC")
            self.losses.append(float(np.mean(ep_losses)))
            self.epoch += 1
            log.info("epoch %d loss %.4f (%.1fs)", self.epoch,
                     self.losses[-1], time.time() - t0)
            if (self.eval_hook is not None
                    and self.epoch > self.max_epochs // 2
                    and self.epoch % self.eval_interval == 0):
                self.eval_hook(self)
                self.ckpt.save(f"epoch_{self.epoch}", self.state,
                               {"epoch": self.epoch})
        # portable inference checkpoint (the .pth state_dict analog,
        # trainer_MaxViT_deform_LKA.py:180-183) — params + stats only,
        # loadable without reconstructing the optimizer pytree
        self.ckpt.save("best_model",
                       {"params": self.state.params,
                        "batch_stats": self.state.batch_stats or {}},
                       {"epoch": self.epoch})
        self.ckpt.wait_until_finished()
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()


class ReduceLROnPlateau:
    """torch-semantics LR plateau scheduler (train_skin_2017.py:105:
    mode 'min', factor 0.5, patience 10). Stateful multiplier consumed by
    the optax schedule below — jit-safe because the multiplier enters the
    step as data, not as a retrace."""

    def __init__(self, factor: float = 0.5, patience: int = 10,
                 threshold: float = 1e-4):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.best = float("inf")
        self.num_bad = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.scale *= self.factor
                self.num_bad = 0
        return self.scale


class TrainerSkin:
    """Skin-lesion binary trainer (train_skin_2017.py:102-152):
    BCE-with-logits, SGD momentum 0.9 wd 1e-4, ReduceLROnPlateau on the
    val loss, best-val-loss checkpointing ({'model_weights', 'val_loss'}
    analog)."""

    def __init__(self, model, output_folder, base_lr: float = 1e-3,
                 max_epochs: int = 100, seed: int = 1234):
        self.model = model
        self.output_folder = Path(output_folder)
        self.output_folder.mkdir(parents=True, exist_ok=True)
        self.base_lr = base_lr
        self.max_epochs = max_epochs
        self.seed = seed
        self.ckpt = CheckpointManager(self.output_folder)
        self.scheduler = ReduceLROnPlateau()
        self.best_val_loss = float("inf")
        self.state = None
        self._step = None
        self._eval_loss = None

    def initialize(self, example_batch):
        # LR enters as data (lr_scale argument) so plateau drops never
        # retrace the jitted step.
        self.tx = optax.chain(
            optax.add_decayed_weights(1e-4),
            optax.sgd(self.base_lr, momentum=0.9))
        variables = self.model.init(
            jax.random.PRNGKey(self.seed),
            jnp.asarray(example_batch["image"][:1]))
        self.state = init_train_state(variables, self.tx)
        model, tx = self.model, self.tx

        def fwd_loss(params, batch_stats, image, mask):
            variables = {"params": params}
            mutable = []
            if batch_stats:
                variables["batch_stats"] = batch_stats
                mutable = ["batch_stats"]
            from deformablelka_tpu.ops import deform_impl, train_impl
            with deform_impl(train_impl()):
                out = (model.apply(variables, image, mutable=mutable)
                       if mutable else model.apply(variables, image))
            new_stats = None
            if mutable:
                out, upd = out
                new_stats = upd.get("batch_stats")
            return bce_with_logits(out, mask[..., 0]), new_stats

        @jax.jit
        def step(state, image, mask, lr_scale):
            (loss, new_stats), grads = jax.value_and_grad(
                fwd_loss, has_aux=True)(state.params, state.batch_stats,
                                        image, mask)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            # plateau scaling: scaling the final update by lr_scale is
            # exactly SGD with lr = base_lr·lr_scale at this step
            updates = jax.tree_util.tree_map(lambda u: u * lr_scale,
                                             updates)
            params = optax.apply_updates(state.params, updates)
            if new_stats is None:
                new_stats = state.batch_stats
            return TrainState(params, new_stats, opt_state,
                              state.step + 1), loss

        @jax.jit
        def eval_loss(state, image, mask):
            loss, _ = fwd_loss(state.params, state.batch_stats, image, mask)
            return loss

        self._step = step
        self._eval_loss = eval_loss

    def run_training(self, train_loader, val_loader, log_every: int = 20):
        lr_scale = 1.0
        for ep in range(self.max_epochs):
            ep_loss, n = 0.0, 0
            for batch in train_loader.epoch():
                if self.state is None:
                    self.initialize(batch)
                self.state, loss = self._step(
                    self.state, jnp.asarray(batch["image"]),
                    jnp.asarray(batch["mask"]),
                    jnp.asarray(lr_scale, jnp.float32))
                ep_loss += float(loss)
                n += 1
                if log_every and n % log_every == 0:
                    log.info("epoch %d iter %d loss %.4f", ep + 1, n,
                             ep_loss / n)
            val_loss, vn = 0.0, 0
            for batch in val_loader.epoch():
                val_loss += float(self._eval_loss(
                    self.state, jnp.asarray(batch["image"]),
                    jnp.asarray(batch["mask"])))
                vn += 1
            mean_val = val_loss / max(vn, 1)
            log.info("epoch %d train %.4f val %.4f", ep + 1,
                     ep_loss / max(n, 1), mean_val)
            if mean_val < self.best_val_loss:
                self.best_val_loss = mean_val
                self.ckpt.save("best_model",
                               {"params": self.state.params,
                                "batch_stats": self.state.batch_stats or {}},
                               {"val_loss": mean_val, "epoch": ep + 1})
            lr_scale = self.scheduler.step(mean_val)
        self.ckpt.wait_until_finished()
        return self.state
