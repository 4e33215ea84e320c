"""Loss library (functional, channels-last).

Parity targets (re-derived from the loss definitions):
  /root/reference/3D/d_lka_former/training/loss_functions/dice_loss.py
    SoftDiceLoss (:158-…): softmax → per-class tp/fp/fn (summed over batch
    when batch_dice), dc = (2tp+s)/(2tp+fp+fn+s), background dropped when
    do_bg=False, loss = -mean(dc); DC_and_CE_loss (:304-…): CE + Dice sum,
    smooth 1e-5, batch_dice=True for the Synapse trainer
    (Trainer_synapse.py:109).
    GDL (:25-…): generalised dice with inverse-square volume weights.
    TopK loss (:380-426): CE over the top-k% hardest voxels.
  deep_supervision.py:20-43 — MultipleOutputLoss2: per-scale losses with
    weights 1/2^i (normalised, zeros allowed).
  2D: /root/reference/2D/utils.py:11-47 one-hot soft dice (per-image),
    trainer loss 0.4·CE + 0.6·Dice (trainer_MaxViT_deform_LKA.py:137-139).
  poly LR: poly_lr.py:16-17.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp


def softmax_helper(logits):
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def one_hot(labels, num_classes):
    """labels: (..., ) int → (..., num_classes) float32."""
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


class SoftDiceLoss:
    """nnUNet-style soft dice. logits (B, *S, C), labels (B, *S) int."""

    def __init__(self, batch_dice=True, do_bg=False, smooth=1e-5):
        self.batch_dice = batch_dice
        self.do_bg = do_bg
        self.smooth = smooth

    def __call__(self, logits, labels, loss_mask=None):
        C = logits.shape[-1]
        probs = softmax_helper(logits)
        y = one_hot(labels, C)
        axes = tuple(range(1, logits.ndim - 1))  # spatial
        if self.batch_dice:
            axes = (0,) + axes
        if loss_mask is not None:
            m = loss_mask[..., None]
            probs = probs * m
            y = y * m
        tp = jnp.sum(probs * y, axis=axes)
        fp = jnp.sum(probs * (1 - y), axis=axes)
        fn = jnp.sum((1 - probs) * y, axis=axes)
        dc = (2 * tp + self.smooth) / (2 * tp + fp + fn + self.smooth)
        if not self.do_bg:
            dc = dc[..., 1:] if self.batch_dice else dc[:, 1:]
        return -jnp.mean(dc)


def soft_dice_squared(logits, labels, smooth=1e-5, do_bg=False,
                      batch_dice=True):
    """SoftDiceLossSquared (dice_loss.py:245): denominator uses p² + y²."""
    C = logits.shape[-1]
    probs = softmax_helper(logits)
    y = one_hot(labels, C)
    axes = tuple(range(1, logits.ndim - 1))
    if batch_dice:
        axes = (0,) + axes
    inter = jnp.sum(probs * y, axis=axes)
    denom = jnp.sum(probs * probs + y * y, axis=axes)
    dc = (2 * inter + smooth) / (denom + smooth)
    if not do_bg:
        dc = dc[..., 1:] if batch_dice else dc[:, 1:]
    return -jnp.mean(dc)


def generalized_dice_loss(logits, labels, smooth=1e-5, do_bg=True,
                          square_volumes=True):
    """GDL (dice_loss.py:25): class weights 1/volume² (per batch when
    batch_dice)."""
    C = logits.shape[-1]
    probs = softmax_helper(logits)
    y = one_hot(labels, C)
    axes = (0,) + tuple(range(1, logits.ndim - 1))
    if not do_bg:
        probs = probs[..., 1:]
        y = y[..., 1:]
    vol = jnp.sum(y, axis=axes)
    w = 1.0 / jnp.maximum(vol * vol if square_volumes else vol, 1e-6)
    tp = jnp.sum(probs * y, axis=axes) * w
    fp = jnp.sum(probs * (1 - y), axis=axes) * w
    fn = jnp.sum((1 - probs) * y, axis=axes) * w
    dc = (2 * jnp.sum(tp) + smooth) / (
        2 * jnp.sum(tp) + jnp.sum(fp) + jnp.sum(fn) + smooth)
    return -dc


def cross_entropy(logits, labels, loss_mask=None):
    """Mean CE over voxels; labels int (B, *S)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32),
                             axis=-1)[..., 0]
    if loss_mask is not None:
        return -jnp.sum(ll * loss_mask) / jnp.maximum(jnp.sum(loss_mask), 1)
    return -jnp.mean(ll)


def topk_cross_entropy(logits, labels, k_percent=10.0):
    """TopK loss (TopK_loss.py): mean CE over the hardest k% voxels."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32),
                              axis=-1)[..., 0]
    flat = ll.reshape(-1)
    k = max(1, int(flat.shape[0] * k_percent / 100))
    top, _ = jax.lax.top_k(flat, k)
    return jnp.mean(top)


def dc_and_ce_loss(logits, labels, weight_ce=1.0, weight_dice=1.0,
                   batch_dice=True, smooth=1e-5, loss_mask=None):
    dice = SoftDiceLoss(batch_dice=batch_dice, smooth=smooth)(
        logits, labels, loss_mask)
    ce = cross_entropy(logits, labels, loss_mask)
    return weight_ce * ce + weight_dice * dice


def dice_ce_2d_loss(logits, labels, ce_weight=0.4, dice_weight=0.6):
    """The 2D trainer loss (trainer_MaxViT_deform_LKA.py:137-139):
    0.4·CE + 0.6·(1 - mean one-hot soft dice). Per-batch dice with smooth
    1e-5 including background (2D/utils.py:11-47)."""
    C = logits.shape[-1]
    probs = softmax_helper(logits)
    y = one_hot(labels, C)
    smooth = 1e-5
    # per-class over the whole batch (utils.py DiceLoss flattens each class)
    axes = tuple(range(0, logits.ndim - 1))
    inter = jnp.sum(probs * y, axis=axes)
    psum = jnp.sum(probs * probs, axis=axes)
    ysum = jnp.sum(y * y, axis=axes)
    dice_per_class = (2 * inter + smooth) / (psum + ysum + smooth)
    dice_loss = 1.0 - jnp.mean(dice_per_class)
    ce = cross_entropy(logits, labels)
    return ce_weight * ce + dice_weight * dice_loss


def deep_supervision_weights(n_outputs: int) -> np.ndarray:
    """1/2^i normalised (d_lka_former_trainer_synapse.py:92-108)."""
    w = np.array([1 / (2 ** i) for i in range(n_outputs)])
    return w / w.sum()


def downsample_labels(labels, factor):
    """Order-0 (strided) downsample of an int label map — the deep
    supervision target generator (DownsampleSegForDSTransform2 with
    order 0). labels: (B, *S)."""
    sl = (slice(None),) + tuple(slice(None, None, f) for f in factor)
    return labels[sl]


def deep_supervision_loss(outputs: Sequence, labels, loss_fn=dc_and_ce_loss):
    """MultipleOutputLoss2: weighted sum of per-scale losses; target for
    scale i is the order-0 downsampled label map matching outputs[i]."""
    w = deep_supervision_weights(len(outputs))
    total = 0.0
    full = labels.shape[1:]
    for i, out in enumerate(outputs):
        sp = out.shape[1:-1]
        factor = tuple(f // s for f, s in zip(full, sp))
        li = downsample_labels(labels, factor)
        total = total + w[i] * loss_fn(out, li)
    return total


def poly_lr(epoch, max_epochs, initial_lr, exponent=0.9):
    return initial_lr * (1 - epoch / max_epochs) ** exponent
