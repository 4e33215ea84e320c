"""DAT-LKA: Deformable-Attention-Transformer encoder + LKA decoder.

Reference behaviour (re-derived):
  /root/reference/2D/networks/DAT/dat.py:89-150 — DAT encoder: 4×4 patch
    embed, dims (96,192,384,768), depths (2,2,6,2), stage spec
    alternating Local window attention ('L') and deformable attention
    ('D'), 2×2 strided down-projections between stages.
  /root/reference/2D/networks/DAT/dat_blocks.py:128-295 —
    DAttentionBaseline: per-group offsets from a depthwise conv + GELU +
    1×1 (tanh-bounded by offset_range_factor/Hk), reference grid in
    [-1,1], K/V sampled by bilinear grid_sample at the offset grid,
    multi-head attention of dense queries against the n_sample keys.
  /root/reference/2D/networks/DAT_LKA_Decoder.py:490-660 — decoder =
    DAEFormer-style MyDecoderLayer but the token mixers are LKABlocks
    (:556-559 — layer_lka_1 applied twice), cross-attention skip fusion,
    PatchExpand / FinalPatchExpand ×4 + 1×1 head.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from deformablelka_tpu.nn.layers import Conv2d, Linear, gelu
from deformablelka_tpu.nn.norms import LayerNorm
from deformablelka_tpu.nn.lka2d import LKABlock
from deformablelka_tpu.ops.deform2d import grid_sample_bilinear
from deformablelka_tpu.models.maxvit_dlka import (
    PatchExpand, FinalPatchExpand_X4)
from deformablelka_tpu.models.daeformer import CrossAttentionBlock
from deformablelka_tpu.models.swinunet import (
    window_partition, window_reverse, WindowAttention)


class DAttention(nn.Module):
    """DAttentionBaseline (dat_blocks.py:128-295), NHWC maps."""
    dim: int
    n_heads: int
    n_groups: int
    stage_idx: int
    offset_range_factor: float = 2.0

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        g = self.n_groups
        cg = C // g
        kk = [9, 7, 5, 3][self.stage_idx]

        q = Conv2d(C, (1, 1), name="proj_q")(x)
        # per-group offset net: dw conv kk + LN + GELU + 1×1 → 2
        q_off = q.reshape(B, H, W, g, cg).transpose(0, 3, 1, 2, 4)
        q_off = q_off.reshape(B * g, H, W, cg)
        o = Conv2d(cg, (kk, kk), padding=kk // 2, groups=cg,
                   name="offset_dw")(q_off)
        o = gelu(LayerNorm(name="offset_norm")(o))
        offset = Conv2d(2, (1, 1), use_bias=False, name="offset_proj")(o)
        Hk, Wk = offset.shape[1:3]
        if self.offset_range_factor > 0:
            rng = jnp.asarray([1.0 / Hk, 1.0 / Wk], offset.dtype)
            offset = jnp.tanh(offset) * rng * self.offset_range_factor
        # reference grid in [-1, 1] (y, x), dat_blocks._get_ref_points
        ry = (jnp.arange(Hk) + 0.5) / Hk * 2 - 1
        rx = (jnp.arange(Wk) + 0.5) / Wk * 2 - 1
        ref = jnp.stack(jnp.meshgrid(ry, rx, indexing="ij"), -1)
        pos = offset + ref[None]
        if self.offset_range_factor < 0:
            pos = jnp.tanh(pos)
        # grid_sample expects (x, y)
        grid = jnp.stack([pos[..., 1], pos[..., 0]], -1)
        xs = x.reshape(B, H, W, g, cg).transpose(0, 3, 1, 2, 4)
        xs = xs.reshape(B * g, H, W, cg)
        sampled = grid_sample_bilinear(xs, grid)  # (B·g, Hk, Wk, cg)
        sampled = sampled.reshape(B, g, Hk * Wk, cg)
        sampled = sampled.transpose(0, 2, 1, 3).reshape(B, Hk * Wk, C)

        k = Linear(C, name="proj_k")(sampled)
        v = Linear(C, name="proj_v")(sampled)
        h = self.n_heads
        hc = C // h
        qh = q.reshape(B, H * W, h, hc)
        kh = k.reshape(B, Hk * Wk, h, hc)
        vh = v.reshape(B, Hk * Wk, h, hc)
        attn = jnp.einsum("bnhc,bmhc->bhnm", qh, kh) * hc ** -0.5
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhc->bnhc", attn, vh).reshape(B, H, W, C)
        return Conv2d(C, (1, 1), name="proj_out")(out)


class DATBlock(nn.Module):
    dim: int
    n_heads: int
    spec: str  # 'L' or 'D'
    n_groups: int
    stage_idx: int
    window_size: int = 7
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        n = LayerNorm(name="norm1")(x)
        if self.spec == "L":
            ws = min(self.window_size, H, W)
            wins = window_partition(n, ws)
            wins = WindowAttention(self.dim, self.n_heads, ws,
                                   name="attn")(wins)
            a = window_reverse(wins, ws, H, W)
        else:
            a = DAttention(self.dim, self.n_heads, self.n_groups,
                           self.stage_idx, name="attn")(n)
        x = x + a
        n = LayerNorm(name="norm2")(x)
        m = Linear(C * self.expansion, name="fc1")(n)
        m = Linear(C, name="fc2")(gelu(m))
        return x + m


class DATEncoder(nn.Module):
    dims: Sequence[int] = (96, 192, 384, 768)
    depths: Sequence[int] = (2, 2, 6, 2)
    heads: Sequence[int] = (3, 6, 12, 24)
    groups: Sequence[int] = (1, 1, 3, 6)
    stage_spec: Sequence = ("LD", "LD", "LDLDLD", "LD")

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.dims[0], (4, 4), strides=(4, 4),
                    name="patch_proj")(x)
        h = LayerNorm(name="patch_norm")(h)
        outs = []
        for s in range(4):
            for b in range(self.depths[s]):
                h = DATBlock(self.dims[s], self.heads[s],
                             self.stage_spec[s][b], self.groups[s], s,
                             name=f"stage{s}_b{b}")(h)
            outs.append(h)
            if s < 3:
                h = nn.Conv(self.dims[s + 1], (2, 2), strides=(2, 2),
                            use_bias=False, name=f"down{s}")(h)
                h = LayerNorm(name=f"down_norm{s}")(h)
        return outs


class DATLKADecoderLayer(nn.Module):
    """MyDecoderLayer (DAT_LKA_Decoder.py:490-570): cross-attn skip
    fusion + two LKABlocks (layer_lka applied twice, :556-559)."""
    dims: int
    out_dim: int
    x1_dim: int
    n_class: int = 9
    is_last: bool = False

    @nn.compact
    def __call__(self, x1, x2=None):
        if x2 is None:
            return PatchExpand(name="layer_up")(x1)
        B, H, W, C = x2.shape
        x2t = x2.reshape(B, H * W, C)
        x1e = Linear(self.out_dim, name="x1_linear")(x1)
        ca_dim = self.dims * 2 if self.is_last else self.dims
        ca = CrossAttentionBlock(ca_dim, ca_dim, ca_dim,
                                 name="cross_attn")(x1e, x2t, H, W)
        t = Linear(self.out_dim, name="concat_linear")(ca)
        m = t.reshape(B, H, W, self.out_dim)
        m = LKABlock(name="layer_lka_1")(m)
        m = LKABlock(name="layer_lka_2")(m)
        if self.is_last:
            m = FinalPatchExpand_X4(name="layer_up")(m)
            return Conv2d(self.n_class, (1, 1), name="last_layer")(m)
        m = PatchExpand(name="layer_up")(m)
        return m.reshape(B, 2 * H * 2 * W, self.out_dim // 2)


class DATLKAFormer(nn.Module):
    """DAT_LKA_Decoder.py full model. (B,H,W,1|3) → (B,H,W,n_class)."""
    num_classes: int = 9
    dims: Sequence[int] = (96, 192, 384, 768)
    depths: Sequence[int] = (2, 2, 6, 2)
    heads: Sequence[int] = (3, 6, 12, 24)
    groups: Sequence[int] = (1, 1, 3, 6)
    stage_spec: Sequence = ("LD", "LD", "LDLDLD", "LD")

    @nn.compact
    def __call__(self, x):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        e0, e1, e2, e3 = DATEncoder(self.dims, self.depths, self.heads,
                                    self.groups, self.stage_spec,
                                    name="backbone")(x)
        d = self.dims
        t3 = DATLKADecoderLayer(d[3], d[3], d[3], self.num_classes,
                                name="decoder_3")(e3)
        B, H, W, _ = e2.shape
        t2 = DATLKADecoderLayer(d[2], d[2], d[3] // 2, self.num_classes,
                                name="decoder_2")(
            t3.reshape(B, H * W, d[3] // 2), e2)
        B, H, W, _ = e1.shape
        t1 = DATLKADecoderLayer(d[1], d[1], d[2] // 2, self.num_classes,
                                name="decoder_1")(t2, e1)
        B, H, W, _ = e0.shape
        t0 = DATLKADecoderLayer(d[0] // 2, d[0], d[1] // 2,
                                self.num_classes, is_last=True,
                                name="decoder_0")(t1, e0)
        return t0
