"""MaxViT encoder (`maxvit_rmlp_small_rw_224` 4-output variant), NHWC.

Parity targets (re-derived from the vendored timm implementation):
  /root/reference/2D/networks/merit_lib/maxxvit_4out.py
    :608-617  config: embed (96,192,384,768), depths (2,2,5,2), stem
              (32,64), rel_pos 'mlp' (dim 512), layer-scale 1e-6,
    :298-340  rw defaults: MBConv expands from INPUT chs ×4, SE ratio
              1/16 of mid, silu, stride via dw conv, no output bias,
              BN eps 1e-5; transformer: head dim 32, expand_first=False,
              pool 'avg2', LN eps 1e-6.
    :967-1057 MbConvBlock: pre-norm BN → 1×1 expand → BN+act → dw 3×3
              (stride) → BN+act → SE → 1×1 project; avg-pool shortcut.
    :1134-1170 window/grid partition (NHWC).
    :1179-1260 PartitionAttentionCl: LN → partition → MHA(+rel-pos MLP)
              → reverse → layer-scale; LN → MLP → layer-scale.
    :740-784  AttentionCl: qkv packed per-head [q|k|v] (chunk on the last
              axis of (B,N,h,3·dh)); scale 1/√32.
    :1563-1601 Stem: conv3×3 s2 → BN+silu → conv3×3.
    :1605-1739 4-stage assembly, partition size img/32 (= 7 at 224²),
              final LayerNorm2d on the last feature only.
  models_timm/vision_transformer_relpos.py:70-137 — RelPosMlp('cr'):
    bias = MLP(2→512→heads, ReLU) over sign·log(1+|Δ|) coords, gathered
    by relative-position index.
  merit_lib/networks.py:225-293 — MaxViT4Out_Small wrapper (1→3-channel
    conv stem for grayscale; unused when the caller repeats channels).

TPU notes: everything is NHWC; window/grid partitions are pure
reshape/transposes; attention is einsum on the MXU with a precomputed
rel-pos bias (computed on the fly from its tiny MLP — negligible cost).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from deformablelka_tpu.nn.layers import Conv2d, Linear, DropPath, gelu
from deformablelka_tpu.nn.norms import BatchNorm, LayerNorm


def _make_divisible(v, divisor=8, min_value=None, round_limit=0.9):
    min_value = min_value or divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < round_limit * v:
        new_v += divisor
    return new_v


class BNAct(nn.Module):
    """BatchNorm (+ optional silu), torch BN eps 1e-5."""
    apply_act: bool = True
    act: str = "silu"

    @nn.compact
    def __call__(self, x):
        x = BatchNorm(eps=1e-5, name="bn")(x)
        if self.apply_act:
            x = nn.silu(x) if self.act == "silu" else gelu(x)
        return x


class SEModule(nn.Module):
    rd_channels: int
    act: str = "silu"

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = Conv2d(self.rd_channels, 1, use_bias=True, name="fc1")(s)
        s = nn.silu(s) if self.act == "silu" else nn.relu(s)
        s = Conv2d(C, 1, use_bias=True, name="fc2")(s)
        return x * nn.sigmoid(s)


def avg_pool2(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Downsample2d(nn.Module):
    dim_out: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        x = avg_pool2(x)
        if x.shape[-1] != self.dim_out:
            x = Conv2d(self.dim_out, 1, use_bias=self.use_bias,
                       name="expand")(x)
        return x


class MbConv(nn.Module):
    """rw-variant MBConv (expand from input chs, silu, SE 1/16, no output
    bias, stride on the depthwise conv)."""
    out_chs: int
    stride: int = 1
    expand_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        in_chs = x.shape[-1]
        mid = _make_divisible(in_chs * self.expand_ratio)
        shortcut = x
        if self.stride == 2:
            shortcut = Downsample2d(self.out_chs, use_bias=False,
                                    name="shortcut")(x)
        x = BNAct(apply_act=False, name="pre_norm")(x)
        x = Conv2d(mid, 1, use_bias=False, name="conv1_1x1")(x)
        x = BNAct(name="norm1")(x)
        x = Conv2d(mid, 3, stride=self.stride, padding=1, groups=mid,
                   use_bias=False, name="conv2_kxk")(x)
        x = BNAct(name="norm2")(x)
        x = SEModule(rd_channels=int(mid * (1 / 16)), name="se")(x)
        x = Conv2d(self.out_chs, 1, use_bias=False, name="conv3_1x1")(x)
        return x + shortcut


def window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)


def window_reverse(w, ws, H, W):
    C = w.shape[-1]
    x = w.reshape(-1, H // ws, W // ws, ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, H, W, C)


def grid_partition(x, gs):
    B, H, W, C = x.shape
    x = x.reshape(B, gs, H // gs, gs, W // gs, C)
    return x.transpose(0, 2, 4, 1, 3, 5).reshape(-1, gs, gs, C)


def grid_reverse(w, gs, H, W):
    C = w.shape[-1]
    x = w.reshape(-1, H // gs, W // gs, gs, gs, C)
    return x.transpose(0, 3, 1, 4, 2, 5).reshape(-1, H, W, C)


def _rel_log_coords(ws: int) -> np.ndarray:
    """'cr'-mode log coords: sign(Δ)·log(1+|Δ|), (2w-1, 2w-1, 2)."""
    r = np.arange(-(ws - 1), ws, dtype=np.float32)
    table = np.stack(np.meshgrid(r, r, indexing="ij"), axis=-1)
    return np.sign(table) * np.log1p(np.abs(table))


def _rel_index(ws: int) -> np.ndarray:
    """(w², w²) index into the flattened (2w-1)² table; unique() sorts
    pairs lexicographically so rank = (Δy+w-1)·(2w-1) + (Δx+w-1)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"), 0).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, w², w²)
    return ((rel[0] + ws - 1) * (2 * ws - 1) + (rel[1] + ws - 1)).astype(
        np.int32)


class RelPosMlp(nn.Module):
    """'cr' mode: MLP(2→hidden→heads, ReLU) over log coords."""
    num_heads: int
    window_size: int
    hidden_dim: int = 512

    @nn.compact
    def __call__(self):
        ws = self.window_size
        coords = jnp.asarray(_rel_log_coords(ws))        # (2w-1, 2w-1, 2)
        h = Linear(self.hidden_dim, name="mlp_fc1")(coords)
        h = nn.relu(h)
        bias = Linear(self.num_heads, name="mlp_fc2")(h)  # (.., .., heads)
        bias = bias.reshape(-1, self.num_heads)
        idx = jnp.asarray(_rel_index(ws)).reshape(-1)
        bias = bias[idx].reshape(ws * ws, ws * ws, self.num_heads)
        return bias.transpose(2, 0, 1)  # (heads, w², w²)


class AttentionCl(nn.Module):
    """Channels-last MHA with packed-per-head qkv and rel-pos-MLP bias."""
    dim_head: int = 32
    window_size: int = 7

    @nn.compact
    def __call__(self, x):
        *lead, C = x.shape
        nh = C // self.dim_head
        dh = self.dim_head
        B = x.shape[0]
        N = int(np.prod(x.shape[1:-1]))
        qkv = Linear(C * 3, use_bias=True, name="qkv")(x)
        qkv = qkv.reshape(B, N, nh, 3 * dh).transpose(0, 2, 1, 3)
        q, k, v = qkv[..., :dh], qkv[..., dh:2 * dh], qkv[..., 2 * dh:]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (dh ** -0.5)
        bias = RelPosMlp(num_heads=nh, window_size=self.window_size,
                         name="rel_pos")()
        attn = attn + bias[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(*lead, C)
        return Linear(C, use_bias=True, name="proj")(out)


class PartitionAttentionCl(nn.Module):
    partition_type: str = "block"  # or "grid"
    window_size: int = 7
    dim_head: int = 32
    init_values: float = 1e-6
    expand_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        ws = self.window_size
        ls1 = self.param("ls1", nn.initializers.constant(self.init_values),
                         (C,))
        ls2 = self.param("ls2", nn.initializers.constant(self.init_values),
                         (C,))
        y = LayerNorm(eps=1e-6, name="norm1")(x)
        if self.partition_type == "block":
            p = window_partition(y, ws)
        else:
            p = grid_partition(y, ws)
        p = AttentionCl(dim_head=self.dim_head, window_size=ws,
                        name="attn")(p)
        if self.partition_type == "block":
            y = window_reverse(p, ws, H, W)
        else:
            y = grid_reverse(p, ws, H, W)
        x = x + ls1 * y

        y = LayerNorm(eps=1e-6, name="norm2")(x)
        y = Linear(int(C * self.expand_ratio), name="mlp_fc1")(y)
        y = gelu(y)
        y = Linear(C, name="mlp_fc2")(y)
        x = x + ls2 * y
        return x


class MaxxVitBlock(nn.Module):
    out_chs: int
    stride: int = 1
    window_size: int = 7

    @nn.compact
    def __call__(self, x):
        x = MbConv(self.out_chs, stride=self.stride, name="conv")(x)
        x = PartitionAttentionCl(partition_type="block",
                                 window_size=self.window_size,
                                 name="attn_block")(x)
        x = PartitionAttentionCl(partition_type="grid",
                                 window_size=self.window_size,
                                 name="attn_grid")(x)
        return x


class Stem(nn.Module):
    out_chs: Tuple[int, int] = (32, 64)

    @nn.compact
    def __call__(self, x):
        # bias=False on both convs (timm maxvit_rmlp_small_rw_224 stem,
        # verified against the instantiated reference: Conv2d(..,
        # bias=False); BatchNormAct2d carries the affine terms).
        x = Conv2d(self.out_chs[0], 3, stride=2, padding=1, use_bias=False,
                   name="conv1")(x)
        x = BNAct(name="norm1")(x)
        x = Conv2d(self.out_chs[1], 3, stride=1, padding=1, use_bias=False,
                   name="conv2")(x)
        return x


class MaxViT4Out(nn.Module):
    """maxvit_rmlp_small_rw_224 returning the four stage features
    (NHWC, dims (96,192,384,768) at /4, /8, /16, /32); the last feature is
    LayerNorm-ed (maxxvit_4out.py:1722-1731)."""
    embed_dims: Sequence[int] = (96, 192, 384, 768)
    depths: Sequence[int] = (2, 2, 5, 2)
    img_size: int = 224

    @nn.compact
    def __call__(self, x):
        ws = self.img_size // 32
        x = Stem(name="stem")(x)
        feats = []
        for i, (dim, depth) in enumerate(zip(self.embed_dims, self.depths)):
            for j in range(depth):
                x = MaxxVitBlock(dim, stride=2 if j == 0 else 1,
                                 window_size=ws,
                                 name=f"stage{i}_block{j}")(x)
            if i == len(self.embed_dims) - 1:
                feats.append(LayerNorm(eps=1e-6, name="final_norm")(x))
            else:
                feats.append(x)
        return feats
