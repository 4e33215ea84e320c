"""Normalisation layers (channels-last).

Torch-parity notes:
- `LayerNorm` normalises the trailing channel axis (torch nn.LayerNorm on
  a (B, N, C) or (B, H, W, C) layout).
- `InstanceNorm` matches torch InstanceNorm2d/3d defaults: per-sample,
  per-channel over spatial dims, eps 1e-5, affine=True in MONAI's
  get_norm_layer("instance") (dynunet_block.py:55 uses norm_name
  "instance" with affine).
- `BatchNorm` here is inference-style by default (running stats), matching
  the converted-checkpoint use; training mode uses batch stats via the
  `use_running_average` flag, with running stats updated externally.
- `GroupNorm` matches torch GroupNorm (used by the 3D encoder stem,
  model_components.py:19-31).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import flax.linen as nn


class LayerNorm(nn.Module):
    """LayerNorm over the last axis, torch-compatible.

    Default eps matches torch nn.LayerNorm (1e-5); timm-style modules
    (e.g. the MaxViT backbone) pass eps=1e-6 explicitly. The 2026-08-17
    SwinUNet golden bisect showed the 1e-6/1e-5 mismatch is visible at
    ~1e-3 in decoder activations."""
    eps: float = 1e-5
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        C = x.shape[-1]
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) / jnp.sqrt(var + self.eps)
        if self.use_scale:
            y = y * self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return y.astype(dtype)


class GroupNorm(nn.Module):
    num_groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        C = x.shape[-1]
        G = self.num_groups
        xf = x.astype(jnp.float32)
        spatial = xf.shape[1:-1]
        B = xf.shape[0]
        xg = xf.reshape(B, -1, G, C // G)
        mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
        y = ((xg - mean) / jnp.sqrt(var + self.eps)).reshape(xf.shape)
        y = y * self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        y = y + self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return y.astype(dtype)


class InstanceNorm(nn.Module):
    """Instance norm over spatial dims (per sample, per channel)."""
    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        C = x.shape[-1]
        xf = x.astype(jnp.float32)
        axes = tuple(range(1, xf.ndim - 1))
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
        y = (xf - mean) / jnp.sqrt(var + self.eps)
        if self.affine:
            y = y * self.param("scale", nn.initializers.ones, (C,), jnp.float32)
            y = y + self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return y.astype(dtype)


class BatchNorm(nn.Module):
    """BatchNorm with running statistics (torch-compatible).

    In eval mode (`use_running_average=True`, the default) uses the stored
    `mean`/`var` variables from the "batch_stats" collection; in train mode
    uses batch statistics and updates the running stats with momentum 0.1
    (torch default).
    """
    eps: float = 1e-5
    momentum: float = 0.1
    use_running_average: bool = True
    # override for the resnet "zero gamma" trick (resnet.py:164-173)
    scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        ura = (self.use_running_average if use_running_average is None
               else use_running_average)
        dtype = x.dtype
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(C, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(C, jnp.float32))
        xf = x.astype(jnp.float32)
        if ura:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(xf.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= xf.shape[a]
                unbiased = var * n / max(n - 1, 1)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        scale = self.param("scale", self.scale_init, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        y = (xf - mean) / jnp.sqrt(var + self.eps) * scale + bias
        return y.astype(dtype)
