"""Pancreas baseline networks: VNet, 3D ResNet-34 seg net, UNETR-mini.

Reference behaviour (re-derived):
  /root/reference/3D/pancreas_code/networks/vnet.py:5-246 — VNet:
    additive-skip encoder/decoder, 5 levels, ConvBlock(n_stages ×
    [3³ conv + norm + ReLU]), strided-conv downsample, deconv upsample,
    filters 16·2^level, 1×1×1 head, optional dropout 0.5 at the
    bottleneck and before the head.
  /root/reference/3D/pancreas_code/networks/ResNet34.py — ResNet-style
    encoder with a light decoder (captured here as a config of the same
    blocks).
  /root/reference/3D/pancreas_code/networks/unetr.py — ViT encoder +
    conv decoder; we expose a small UNETR built from this framework's
    transformer blocks.

All channels-last (B, D, H, W, C) flax modules.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from deformablelka_tpu.nn.norms import InstanceNorm, GroupNorm, BatchNorm


def _norm(kind, name):
    if kind == "batchnorm":
        return BatchNorm(name=name)
    if kind == "groupnorm":
        return GroupNorm(num_groups=16, name=name)
    if kind == "instancenorm":
        # vnet.py/ResNet34.py use nn.InstanceNorm3d(n) → affine=False
        return InstanceNorm(affine=False, name=name)
    return None


class ConvBlock(nn.Module):
    n_stages: int
    n_filters_out: int
    normalization: str = "none"

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_stages):
            x = nn.Conv(self.n_filters_out, (3, 3, 3), padding="SAME",
                        name=f"conv{i}")(x)
            norm = _norm(self.normalization, f"norm{i}")
            if norm is not None:
                x = norm(x)
            x = nn.relu(x)
        return x


class DownBlock(nn.Module):
    n_filters_out: int
    stride: int = 2
    normalization: str = "none"

    @nn.compact
    def __call__(self, x):
        s = (self.stride,) * 3
        x = nn.Conv(self.n_filters_out, s, strides=s, padding="VALID",
                    name="conv")(x)
        norm = _norm(self.normalization, "norm")
        if norm is not None:
            x = norm(x)
        return nn.relu(x)


class UpBlock(nn.Module):
    n_filters_out: int
    stride: int = 2
    normalization: str = "none"

    @nn.compact
    def __call__(self, x):
        s = (self.stride,) * 3
        x = nn.ConvTranspose(self.n_filters_out, s, strides=s,
                             name="conv")(x)
        norm = _norm(self.normalization, "norm")
        if norm is not None:
            x = norm(x)
        return nn.relu(x)


class VNet(nn.Module):
    """vnet.py:144-246 (additive skips, filters 16·2^l)."""
    n_classes: int = 2
    n_filters: int = 16
    normalization: str = "instancenorm"
    has_dropout: bool = False
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        nf, nm = self.n_filters, self.normalization
        x1 = ConvBlock(1, nf, nm, name="block_one")(x)
        d1 = DownBlock(nf * 2, 2, nm, name="block_one_dw")(x1)
        x2 = ConvBlock(2, nf * 2, nm, name="block_two")(d1)
        d2 = DownBlock(nf * 4, 2, nm, name="block_two_dw")(x2)
        x3 = ConvBlock(3, nf * 4, nm, name="block_three")(d2)
        d3 = DownBlock(nf * 8, 2, nm, name="block_three_dw")(x3)
        x4 = ConvBlock(3, nf * 8, nm, name="block_four")(d3)
        d4 = DownBlock(nf * 16, 2, nm, name="block_four_dw")(x4)
        x5 = ConvBlock(3, nf * 16, nm, name="block_five")(d4)
        if self.has_dropout:
            x5 = nn.Dropout(0.5, deterministic=self.deterministic)(x5)
        u5 = UpBlock(nf * 8, 2, nm, name="block_five_up")(x5) + x4
        x6 = ConvBlock(3, nf * 8, nm, name="block_six")(u5)
        u6 = UpBlock(nf * 4, 2, nm, name="block_six_up")(x6) + x3
        x7 = ConvBlock(3, nf * 4, nm, name="block_seven")(u6)
        u7 = UpBlock(nf * 2, 2, nm, name="block_seven_up")(x7) + x2
        x8 = ConvBlock(2, nf * 2, nm, name="block_eight")(u7)
        u8 = UpBlock(nf, 2, nm, name="block_eight_up")(x8) + x1
        x9 = ConvBlock(1, nf, nm, name="block_nine")(u8)
        if self.has_dropout:
            x9 = nn.Dropout(0.5, deterministic=self.deterministic)(x9)
        return nn.Conv(self.n_classes, (1, 1, 1), name="out_conv")(x9)


class ResSegNet3D(nn.Module):
    """ResNet34-style 3D segmentation baseline (ResNet34.py essence:
    residual basic blocks per stage, strided downsamples, additive-skip
    deconv decoder)."""
    n_classes: int = 2
    n_filters: int = 16
    depths: Sequence[int] = (3, 4, 6, 3)
    normalization: str = "instancenorm"

    @nn.compact
    def __call__(self, x):
        nf, nm = self.n_filters, self.normalization

        def res_stage(h, c, n, name):
            for i in range(n):
                r = h
                h = ConvBlock(2, c, nm, name=f"{name}_b{i}")(h)
                if r.shape[-1] == c:
                    h = h + r
            return h

        h = ConvBlock(1, nf, nm, name="stem")(x)
        skips = []
        c = nf
        for s, n in enumerate(self.depths):
            h = res_stage(h, c, n, f"stage{s}")
            skips.append(h)
            if s < len(self.depths) - 1:
                c *= 2
                h = DownBlock(c, 2, nm, name=f"down{s}")(h)
        for s in reversed(range(len(self.depths) - 1)):
            c //= 2
            h = UpBlock(c, 2, nm, name=f"up{s}")(h) + skips[s]
            h = ConvBlock(1, c, nm, name=f"dec{s}")(h)
        return nn.Conv(self.n_classes, (1, 1, 1), name="out_conv")(h)


class UNETRMini(nn.Module):
    """UNETR-style baseline (unetr.py essence): patchify to tokens, N
    transformer layers, conv decoder from reshaped token maps at
    intermediate depths."""
    n_classes: int = 2
    img_size: Sequence[int] = (96, 96, 96)
    patch_size: int = 16
    hidden: int = 96
    depth: int = 8
    heads: int = 8

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        p = self.patch_size
        gz, gy, gx = [s // p for s in self.img_size]
        t = nn.Conv(self.hidden, (p, p, p), strides=(p, p, p),
                    name="patch_embed")(x)
        t = t.reshape(B, gz * gy * gx, self.hidden)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, gz * gy * gx, self.hidden))
        t = t + pos
        taps = []
        for i in range(self.depth):
            n = nn.LayerNorm(name=f"ln1_{i}")(t)
            a = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, name=f"attn_{i}")(n, n)
            t = t + a
            n = nn.LayerNorm(name=f"ln2_{i}")(t)
            m = nn.Dense(self.hidden * 4, name=f"fc1_{i}")(n)
            m = nn.Dense(self.hidden, name=f"fc2_{i}")(nn.gelu(m))
            t = t + m
            if (i + 1) % (self.depth // 4) == 0:
                taps.append(t)
        import jax
        import math
        n_up = int(math.log2(p))
        h = taps[-1].reshape(B, gz, gy, gx, self.hidden)
        for j in range(n_up):
            c = max(self.hidden // (2 ** (j + 1)), 8)
            h = UpBlock(c, 2, "instancenorm", name=f"up{j}")(h)
            if j < len(taps) - 1:
                skip = taps[-2 - j].reshape(B, gz, gy, gx, self.hidden)
                skip = jax.image.resize(skip, (B, *h.shape[1:4],
                                               self.hidden), "nearest")
                h = jnp.concatenate([h, skip], axis=-1)
            h = ConvBlock(1, c, "instancenorm", name=f"dec{j}")(h)
        return nn.Conv(self.n_classes, (1, 1, 1), name="out_conv")(h)
