"""MViTv2 4-scale encoder + LKA decoder ("MViTLKAFormer" ablation).

Parity targets (re-derived, not translated):
  /root/reference/2D/networks/mvit_model_object_4out.py
    MViT backbone (:272-449): patch-embed conv 7x7/4 -> 56x56x96; 16
    MultiScaleBlocks; stage-end blocks last_block_indexes=(0,2,11,15);
    stride_q=2 on the block after each stage end; hybrid window attention
    (window size 56 halved per stage; the stage-end blocks 2/11/15 are
    global); adaptive kv-pool stride 4 halved per stage (x2 on blocks 2
    and 11); decomposed relative position embeddings (use_rel_pos=True);
    4 outputs scale2..scale5 = 96@/4, 192@/8, 384@/16, 768@/32 each with
    its own LayerNorm.
    MultiScaleAttention (:34-177): per-head depthwise 3x3 pooling conv
    (no bias) + LayerNorm on q/k/v, residual pooling (x += pooled q),
    window partition with padding.
    MultiScaleBlock (:178-271): pre-norm attn with linear channel
    projection on the skip when dim changes and 3x3/s2 max-pool on the
    skip when stride_q=2; MLP ratio 4.
  /root/reference/2D/networks/mvit_utils.py
    window_partition/unpartition (:16-59), get_rel_pos scaled-coord
    lookup (:61-91), add_decomposed_rel_pos (:93-121).
  /root/reference/2D/networks/mvit_LKA_Decoder.py
    MViTLKAFormer (:580-645): MViT encoder + 4 LKA decoder stages (the
    same MyDecoderLayer/LKABlock decoder as MaxViT_LKA_Decoder; the
    reference's forward accidentally applies `layer_lka_1` twice, we use
    two distinct blocks like every other decoder in the family).

TPU notes: all shapes are static for a fixed img_size, so the window
grid, rel-pos index tables, and pooling convs compile to fixed XLA
programs; attention runs as plain batched matmuls on the MXU with the
(B*heads*windows) product folded into the leading dim. The per-head
pooling convs are depthwise 3x3 convs over a (B*heads, H, W, hd) layout
— one feature-group conv each, not a python loop over heads.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from deformablelka_tpu.nn.layers import Conv2d, Linear, DropPath, gelu
from deformablelka_tpu.nn.norms import LayerNorm


def window_partition(x, ws: int):
    """(B,H,W,C) -> (B*nw, ws, ws, C) with zero padding; returns (Hp,Wp)."""
    B, H, W, C = x.shape
    pad_h = (-H) % ws
    pad_w = (-W) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
    return x, (Hp, Wp)


def window_unpartition(w, ws: int, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = w.shape[0] // (Hp * Wp // ws // ws)
    x = w.reshape(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def _rel_pos_select(q_size: int, k_size: int, rel_pos):
    """get_rel_pos (mvit_utils.py:61-91): scaled-coordinate lookup table.

    The param is sized 2*max(q,k)-1 at build time, so no interpolation
    branch is needed; the index table is a compile-time numpy constant.
    """
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(np.int64)]


def add_decomposed_rel_pos(attn, q, rel_h, rel_w, q_hw, k_hw):
    """mvit_utils.py:93-121 — decomposed rel-pos bias on the attn logits."""
    q_h, q_w = q_hw
    k_h, k_w = k_hw
    Rh = _rel_pos_select(q_h, k_h, rel_h)
    Rw = _rel_pos_select(q_w, k_w, rel_w)
    B, _, dim = q.shape
    r_q = q.reshape(B, q_h, q_w, dim)
    bh = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh)
    bw = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw)
    attn = attn.reshape(B, q_h, q_w, k_h, k_w)
    attn = attn + bh[:, :, :, :, None] + bw[:, :, :, None, :]
    return attn.reshape(B, q_h * q_w, k_h * k_w)


class _PoolNorm(nn.Module):
    """attention_pool (mvit_model_object_4out.py:22-31): depthwise 3x3
    conv (no bias) + LayerNorm over per-head maps."""
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = Conv2d(c, 3, stride=self.stride, padding=((1, 1), (1, 1)),
                   groups=c, use_bias=False, name="pool")(x)
        return LayerNorm(name="norm")(x)


class MultiScaleAttention(nn.Module):
    dim_out: int
    num_heads: int
    stride_q: int = 1
    stride_kv: int = 1
    window_size: int = 0          # 0 = global
    input_size: Tuple[int, int] = (56, 56)
    use_rel_pos: bool = True
    residual_pooling: bool = True

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        nh = self.num_heads
        hd = self.dim_out // nh
        qkv = Linear(3 * self.dim_out, name="qkv")(x)
        qkv = qkv.reshape(B, H, W, 3, nh, hd).transpose(3, 0, 4, 1, 2, 5)
        q, k, v = qkv.reshape(3, B * nh, H, W, hd)

        q = _PoolNorm(self.stride_q, name="q_pool")(q)
        k = _PoolNorm(self.stride_kv, name="k_pool")(k)
        v = _PoolNorm(self.stride_kv, name="v_pool")(v)

        ori_q = q
        if self.window_size:
            q_win = self.window_size // self.stride_q
            kv_win = self.window_size // self.stride_kv
            q, q_pad = window_partition(q, q_win)
            k, _ = window_partition(k, kv_win)
            v, _ = window_partition(v, kv_win)
            q_hw, k_hw = (q_win, q_win), (kv_win, kv_win)
        else:
            q_hw = q.shape[1:3]
            k_hw = k.shape[1:3]

        nq = q.shape[0]
        q = q.reshape(nq, q_hw[0] * q_hw[1], hd)
        k = k.reshape(nq, k_hw[0] * k_hw[1], hd)
        v = v.reshape(nq, k_hw[0] * k_hw[1], hd)

        attn = jnp.einsum("bqc,bkc->bqk", q * (hd ** -0.5), k)
        if self.use_rel_pos:
            size = self.input_size[0]
            rel_dim = 2 * max(size // self.stride_q,
                              size // self.stride_kv) - 1
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (rel_dim, hd))
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (rel_dim, hd))
            attn = add_decomposed_rel_pos(attn, q, rel_h, rel_w, q_hw, k_hw)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", attn, v)
        out = out.reshape(nq, q_hw[0], q_hw[1], hd)

        if self.window_size:
            out = window_unpartition(out, q_win, q_pad, ori_q.shape[1:3])
        if self.residual_pooling:
            out = out + ori_q

        Hq, Wq = out.shape[1:3]
        out = out.reshape(B, nh, Hq, Wq, hd).transpose(0, 2, 3, 1, 4)
        out = out.reshape(B, Hq, Wq, self.dim_out)
        return Linear(self.dim_out, name="proj")(out)


class MultiScaleBlock(nn.Module):
    dim: int
    dim_out: int
    num_heads: int
    stride_q: int = 1
    stride_kv: int = 1
    window_size: int = 0
    input_size: Tuple[int, int] = (56, 56)
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        xn = LayerNorm(name="norm1")(x)
        xb = MultiScaleAttention(
            self.dim_out, self.num_heads, stride_q=self.stride_q,
            stride_kv=self.stride_kv, window_size=self.window_size,
            input_size=self.input_size, name="attn")(xn)
        if self.dim != self.dim_out:
            x = Linear(self.dim_out, name="proj")(xn)
        if self.stride_q > 1:
            # pool_skip: max-pool k=stride_q+1, stride=stride_q, pad k//2
            ks = self.stride_q + 1
            x = nn.max_pool(x, (ks, ks),
                            strides=(self.stride_q, self.stride_q),
                            padding=((ks // 2, ks // 2), (ks // 2, ks // 2)))
        dp = DropPath(self.drop_path, deterministic=self.deterministic,
                      name="drop_path")
        x = x + dp(xb)
        h = LayerNorm(name="norm2")(x)
        h = Linear(int(self.dim_out * self.mlp_ratio), name="mlp_fc1")(h)
        h = gelu(h)
        h = Linear(self.dim_out, name="mlp_fc2")(h)
        return x + dp(h)


class MViT4Out(nn.Module):
    """MViTv2-Small-ish 4-out backbone (mvit_model_object_4out.py:272-449).

    Input NHWC (B,H,W,3); returns [96@/4, 192@/8, 384@/16, 768@/32]."""
    img_size: int = 224
    embed_dim: int = 96
    depth: int = 16
    num_heads: int = 1
    last_block_indexes: Sequence[int] = (0, 2, 11, 15)
    adaptive_kv_stride: int = 4
    adaptive_window_size: int = 56
    drop_path_rate: float = 0.0
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.embed_dim, (7, 7), stride=4,
                   padding=((3, 3), (3, 3)), name="patch_embed")(x)

        last = tuple(self.last_block_indexes)
        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        embed_dim = self.embed_dim
        dim_out = self.embed_dim
        num_heads = self.num_heads
        stride_kv = self.adaptive_kv_stride
        window_size = self.adaptive_window_size
        input_size = (self.img_size // 4, self.img_size // 4)

        outs = []
        for i in range(self.depth):
            stride_kv_ = stride_kv * 2 if i in (last[1], last[2]) else stride_kv
            window_size_ = 0 if i in last[1:] else window_size
            x = MultiScaleBlock(
                dim=embed_dim, dim_out=dim_out, num_heads=num_heads,
                stride_q=2 if (i - 1) in last else 1,
                stride_kv=stride_kv_, window_size=window_size_,
                input_size=input_size, drop_path=float(dpr[i]),
                deterministic=self.deterministic, name=f"block{i}")(x)
            embed_dim = dim_out
            if i in last:
                outs.append(LayerNorm(name=f"scale{len(outs) + 2}_norm")(x))
                dim_out *= 2
                num_heads *= 2
                stride_kv = max(stride_kv // 2, 1)
            if (i - 1) in last:
                window_size //= 2
                input_size = (input_size[0] // 2, input_size[1] // 2)
        return outs


class MViTLKAFormer(nn.Module):
    """MViT encoder + LKA decoder (mvit_LKA_Decoder.py:580-645).

    Input (B,H,W,1|3) -> logits (B,H,W,num_classes)."""
    num_classes: int = 9
    img_size: int = 224
    embed_dim: int = 96
    depth: int = 16
    last_block_indexes: Sequence[int] = (0, 2, 11, 15)
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        from deformablelka_tpu.models.maxvit_dlka import DecoderLayer
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        e0, e1, e2, e3 = MViT4Out(img_size=self.img_size,
                                  embed_dim=self.embed_dim,
                                  depth=self.depth,
                                  last_block_indexes=self.last_block_indexes,
                                  deterministic=self.deterministic,
                                  name="backbone")(x)
        det = self.deterministic
        d = self.embed_dim
        t3 = DecoderLayer(out_dim=8 * d, n_class=self.num_classes,
                          deterministic=det, deformable=False,
                          name="decoder_3")(e3)
        t2 = DecoderLayer(out_dim=4 * d, n_class=self.num_classes,
                          deterministic=det, deformable=False,
                          name="decoder_2")(t3, e2)
        t1 = DecoderLayer(out_dim=2 * d, n_class=self.num_classes,
                          deterministic=det, deformable=False,
                          name="decoder_1")(t2, e1)
        t0 = DecoderLayer(out_dim=d, n_class=self.num_classes,
                          is_last=True, deterministic=det, deformable=False,
                          name="decoder_0")(t1, e0)
        return t0
