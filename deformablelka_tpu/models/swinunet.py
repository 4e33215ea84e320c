"""SwinUNet — Swin-Transformer encoder/decoder U-Net (2D ablation +
skin baseline).

Reference behaviour (re-derived):
  /root/reference/2D/networks/swinunet.py (SwinTransformerSys, ~750 LoC;
  also vendored under 2D/skin_code/model/swinunet/): 4×4 patch embed →
  4 stages of Swin blocks (window attention 7×7 with relative position
  bias, alternating cyclic shift, MLP ratio 4) with PatchMerging between
  stages; symmetric decoder with PatchExpand ×2, concat skips reduced by
  a linear layer, final ×4 expand + 1×1 head.

TPU-first: window partition is pure reshape/transpose (layout ops);
attention over (num_windows·B, 49, C) batches onto the MXU; the shift is
jnp.roll (regular memory movement); static shapes throughout.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from deformablelka_tpu.nn.layers import Linear, gelu
from deformablelka_tpu.nn.norms import LayerNorm
from deformablelka_tpu.models.maxvit_dlka import (
    PatchExpand, FinalPatchExpand_X4)


def window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def window_reverse(wins, ws, H, W):
    B = wins.shape[0] // (H // ws * W // ws)
    x = wins.reshape(B, H // ws, W // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def relative_position_index(ws):
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7

    @nn.compact
    def __call__(self, x, mask=None):
        Bw, N, C = x.shape
        h = self.num_heads
        ws = self.window_size
        qkv = Linear(3 * C, name="qkv")(x).reshape(Bw, N, 3, h, C // h)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        attn = jnp.einsum("bhnc,bhmc->bhnm", q, k) * (C // h) ** -0.5
        table = self.param("relative_position_bias_table",
                           nn.initializers.normal(0.02),
                           ((2 * ws - 1) ** 2, h))
        idx = relative_position_index(ws).reshape(-1)
        bias = table[idx].reshape(N, N, h).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(Bw // nw, nw, h, N, N) + mask[None, :,
                                                              None]
            attn = attn.reshape(Bw, h, N, N)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmc->bhnc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(Bw, N, C)
        return Linear(C, name="proj")(out)


def shift_mask(H, W, ws, shift):
    """SW-MSA attention mask for cyclic shift (−100 on cross-region)."""
    img = np.zeros((1, H, W, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift),
                    slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    wins = window_partition(jnp.asarray(img), ws).reshape(-1, ws * ws)
    diff = wins[:, :, None] - wins[:, None, :]
    return jnp.where(diff != 0, -100.0, 0.0)


class SwinBlock(nn.Module):
    """clamp_shift=True (default) is SwinTransformerSys semantics:
    shift disabled once the map is a single window (swinunet.py).
    The detection-style Swin vendored in STViTEncoder_LKADecoder.py
    (:205-263) has NO such clamp — it rolls and masks within the lone
    window; STViT stage 3 (7×7) passes clamp_shift=False."""
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    clamp_shift: bool = True

    @nn.compact
    def __call__(self, x, H, W):
        B, N, C = x.shape
        ws = min(self.window_size, H, W)
        shift = self.shift_size
        if self.clamp_shift and ws >= min(H, W):
            shift = 0
        shortcut = x
        x = LayerNorm(name="norm1")(x).reshape(B, H, W, C)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = shift_mask(H, W, ws, shift)
        else:
            mask = None
        wins = window_partition(x, ws)
        wins = WindowAttention(self.dim, self.num_heads, ws,
                               name="attn")(wins, mask)
        x = window_reverse(wins, ws, H, W)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + x.reshape(B, N, C)
        n = LayerNorm(name="norm2")(x)
        m = Linear(int(C * self.mlp_ratio), name="fc1")(n)
        m = Linear(C, name="fc2")(gelu(m))
        return x + m


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, H, W):
        B, N, C = x.shape
        x = x.reshape(B, H, W, C)
        parts = [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2],
                 x[:, 1::2, 1::2]]
        x = jnp.concatenate(parts, axis=-1).reshape(B, N // 4, 4 * C)
        x = LayerNorm(name="norm")(x)
        return Linear(2 * C, use_bias=False, name="reduction")(x)


class SwinUNet(nn.Module):
    """SwinTransformerSys (swinunet.py): encoder depths (2,2,2,2),
    heads (3,6,12,24), embed 96, window 7; UNet decoder with concat
    skips."""
    num_classes: int = 9
    img_size: int = 224
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7

    @nn.compact
    def __call__(self, x):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        B = x.shape[0]
        # patch embed 4×4
        h = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4),
                    name="patch_embed")(x)
        Hs, Ws = h.shape[1:3]
        t = LayerNorm(name="embed_norm")(h.reshape(B, Hs * Ws,
                                                   self.embed_dim))
        dims = [self.embed_dim * 2 ** i for i in range(4)]
        skips = []
        H, W = Hs, Ws
        # skips are the PRE-block stage inputs (x_downsample.append(x)
        # BEFORE x = layer(x), swinunet.py:699-703)
        for s in range(4):
            skips.append((t, H, W))
            for b in range(self.depths[s]):
                t = SwinBlock(dims[s], self.num_heads[s],
                              self.window_size,
                              shift_size=0 if b % 2 == 0
                              else self.window_size // 2,
                              name=f"enc{s}_b{b}")(t, H, W)
            if s < 3:
                t = PatchMerging(dims[s], name=f"merge{s}")(t, H, W)
                H, W = H // 2, W // 2
        t = LayerNorm(name="norm")(t)   # swinunet.py:705 self.norm
        # decoder
        for s in reversed(range(3)):
            m = PatchExpand(name=f"expand{s}")(
                t.reshape(B, H, W, dims[s + 1]))
            H, W = H * 2, W * 2
            t = m.reshape(B, H * W, dims[s])
            skip_t, sh, sw = skips[s]
            t = jnp.concatenate([t, skip_t], axis=-1)
            t = Linear(dims[s], name=f"concat_linear{s}")(t)
            for b in range(self.depths[s]):
                t = SwinBlock(dims[s], self.num_heads[s],
                              self.window_size,
                              shift_size=0 if b % 2 == 0
                              else self.window_size // 2,
                              name=f"dec{s}_b{b}")(t, H, W)
        t = LayerNorm(name="norm_up")(t)   # swinunet.py:722 norm_up
        m = FinalPatchExpand_X4(name="final_expand")(
            t.reshape(B, H, W, dims[0]))
        # output conv is bias-free (swinunet.py:673)
        return nn.Conv(self.num_classes, (1, 1), use_bias=False,
                       name="output")(m)
