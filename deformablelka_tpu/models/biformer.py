"""BiFormer encoder + DAEFormer decoder ("BiDAEFormer" ablation).

Parity targets (re-derived):
  /root/reference/2D/networks/BiEncoderDAEDecoder.py
    TopkRouting (:455-491): window-level routing — detached window-mean
    q/k logits, top-k window indices + softmax routing weights.
    KVGather (:494-525): gather the k/v pixels of the top-k routed
    windows per query window (mul_weight='none' in this config).
    BiLevelRoutingAttention (:540-733): NHWC; auto-pad to the n_win
    grid; per-window qkv (QKVLinear :527-538, q:qk_dim + kv:qk_dim+dim);
    kv_downsample_mode='identity'; LePE depthwise 5x5 on the v stream;
    per-window multi-head attention over the routed (topk * w^2) keys;
    + lepe; output linear; crop padding.
    Block (:736-822): x + dwconv3x3 pos-embed, pre-norm LN(eps 1e-6),
    attn by topk: >0 routing attention, -2 AttentionLePE (full attention
    + LePE, _common.py:63-112), -1 vanilla, 0 conv pseudo-attention;
    MLP Linear-GELU-Linear ratio 3; no layer scale (init -1).
    BiFormer_mm (:989-1079): 3-stage segmentation variant — stem two
    3x3/2 conv+BN (GELU between), 3x3/2 conv+BN between stages, depths
    [4,18,4], dims [128,320,512], head_dim 32, n_win 8,
    topks [1,16,-2], per-stage output LayerNorm2d.
    BiDAEFormer (:1081-1166): that encoder + the DAEFormer decoder
    (CrossAttentionBlock skip fusion + DualTransformerBlock pairs),
    reused from models/daeformer.DecoderLayer.

TPU notes: routing is lax.top_k over the 64-window logit matrix +
take_along_axis gathers of whole windows — regular shapes, so XLA lays
the (p^2, topk, w^2) gather out as a cheap HBM gather; all attention is
batched matmuls with (B * n_win^2) folded into the leading dimension;
auto-padding is static for a fixed img_size.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from deformablelka_tpu.nn.layers import Conv2d, Linear, gelu
from deformablelka_tpu.nn.norms import LayerNorm, BatchNorm
from deformablelka_tpu.nn.segformer import map_to_tokens
from deformablelka_tpu.models.daeformer import DecoderLayer


class BiLevelRoutingAttention(nn.Module):
    """Bi-level routing attention, identity kv-downsample config."""
    dim: int
    num_heads: int
    n_win: int = 8
    topk: int = 4
    side_dwconv: int = 5

    @nn.compact
    def __call__(self, x):
        N, H_in, W_in, C = x.shape
        nw = self.n_win
        pad_b = (-H_in) % nw
        pad_r = (-W_in) % nw
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        H, W = H_in + pad_b, W_in + pad_r
        h, w = H // nw, W // nw
        p2 = nw * nw
        qk = self.dim  # qk_dims == embed_dims in this config

        # windows (n, p^2, h, w, c)
        xw = x.reshape(N, nw, h, nw, w, C).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(N, p2, h, w, C)

        qkv = Linear(2 * qk + self.dim, name="qkv")(xw)
        q, kv = qkv[..., :qk], qkv[..., qk:]
        q_pix = q.reshape(N, p2, h * w, qk)
        kv_pix = kv.reshape(N, p2, h * w, qk + self.dim)

        q_win = q.mean(axis=(2, 3))                    # (n, p^2, qk)
        k_win = kv[..., :qk].mean(axis=(2, 3))

        # LePE on the v stream over the full map
        v_map = kv[..., qk:].reshape(N, nw, nw, h, w, C)
        v_map = v_map.transpose(0, 1, 3, 2, 4, 5).reshape(N, H, W, C)
        lepe = Conv2d(C, self.side_dwconv, padding="same", groups=C,
                      name="lepe")(v_map)

        # hard non-differentiable routing (detached logits)
        logits = jnp.einsum(
            "npc,nqc->npq", jax.lax.stop_gradient(q_win) * qk ** -0.5,
            jax.lax.stop_gradient(k_win))
        _, idx = jax.lax.top_k(logits, self.topk)      # (n, p^2, topk)

        # gather routed kv windows: (n, p^2, topk, h*w, c_kv)
        kv_sel = jnp.take_along_axis(
            kv_pix[:, None], idx[..., None, None], axis=2)
        k_sel = kv_sel[..., :qk]
        v_sel = kv_sel[..., qk:]

        m = self.num_heads
        hd_qk = qk // m
        hd_v = self.dim // m
        L = self.topk * h * w
        k_sel = k_sel.reshape(N, p2, L, m, hd_qk).transpose(0, 1, 3, 2, 4)
        v_sel = v_sel.reshape(N, p2, L, m, hd_v).transpose(0, 1, 3, 2, 4)
        qh = q_pix.reshape(N, p2, h * w, m, hd_qk).transpose(0, 1, 3, 2, 4)

        attn = jnp.einsum("npmqc,npmkc->npmqk", qh * qk ** -0.5, k_sel)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("npmqk,npmkc->npmqc", attn, v_sel)
        out = out.transpose(0, 1, 3, 2, 4).reshape(N, p2, h * w, self.dim)
        out = out.reshape(N, nw, nw, h, w, self.dim)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(N, H, W, self.dim)

        out = Linear(self.dim, name="wo")(out + lepe)
        if pad_b or pad_r:
            out = out[:, :H_in, :W_in]
        return out


class AttentionLePE(nn.Module):
    """Full attention + LePE (_common.py:63-112). NHWC in/out."""
    dim: int
    num_heads: int = 8
    side_dwconv: int = 5

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        N = H * W
        m = self.num_heads
        hd = C // m
        t = x.reshape(B, N, C)
        qkv = Linear(3 * C, use_bias=False, name="qkv")(t)
        q, k, v = qkv.reshape(B, N, 3, m, hd).transpose(2, 0, 3, 1, 4)
        lepe = Conv2d(C, self.side_dwconv, padding="same", groups=C,
                      name="lepe")(x).reshape(B, N, C)
        attn = nn.softmax(
            jnp.einsum("bmqc,bmkc->bmqk", q, k) * hd ** -0.5, axis=-1)
        o = jnp.einsum("bmqk,bmkc->bmqc", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, C) + lepe
        return Linear(C, name="proj")(o).reshape(B, H, W, C)


class BiFormerBlock(nn.Module):
    dim: int
    num_heads: int
    n_win: int = 8
    topk: int = 4
    mlp_ratio: float = 3.0
    side_dwconv: int = 5

    @nn.compact
    def __call__(self, x):
        # conv position embedding (before_attn_dwconv=3)
        x = x + Conv2d(self.dim, 3, padding="same", groups=self.dim,
                       name="pos_embed")(x)
        n1 = LayerNorm(eps=1e-6, name="norm1")(x)  # Block: LN eps 1e-6
        if self.topk > 0:
            a = BiLevelRoutingAttention(
                self.dim, self.num_heads, n_win=self.n_win,
                topk=self.topk, side_dwconv=self.side_dwconv,
                name="attn")(n1)
        else:  # topk == -2 in this config: full attention + LePE.
            # Block passes only (dim, side_dwconv), so AttentionLePE
            # keeps its DEFAULT num_heads=8 — not dim//head_dim
            # (BiEncoderDAEDecoder.py:761).
            a = AttentionLePE(self.dim, 8, self.side_dwconv,
                              name="attn")(n1)
        x = x + a
        n2 = LayerNorm(eps=1e-6, name="norm2")(x)
        h = Linear(int(self.dim * self.mlp_ratio), name="fc1")(n2)
        h = Linear(self.dim, name="fc2")(gelu(h))
        return x + h


class BiFormer3Out(nn.Module):
    """BiFormer_mm 3-stage segmentation backbone; NHWC pyramid outputs
    at /4, /8, /16."""
    dims: Sequence[int] = (128, 320, 512)
    depths: Sequence[int] = (4, 18, 4)
    head_dim: int = 32
    n_win: int = 8
    topks: Sequence[int] = (1, 16, -2)
    mlp_ratio: float = 3.0
    use_running_average: bool = True

    @nn.compact
    def __call__(self, x):
        ura = self.use_running_average
        outs = []
        for s, (dim, depth, topk) in enumerate(
                zip(self.dims, self.depths, self.topks)):
            if s == 0:
                x = Conv2d(dim // 2, 3, stride=2, padding=((1, 1), (1, 1)),
                           name="stem_conv1")(x)
                x = gelu(BatchNorm(use_running_average=ura,
                                   name="stem_bn1")(x))
                x = Conv2d(dim, 3, stride=2, padding=((1, 1), (1, 1)),
                           name="stem_conv2")(x)
                x = BatchNorm(use_running_average=ura, name="stem_bn2")(x)
            else:
                x = Conv2d(dim, 3, stride=2, padding=((1, 1), (1, 1)),
                           name=f"down{s}_conv")(x)
                x = BatchNorm(use_running_average=ura,
                              name=f"down{s}_bn")(x)
            for i in range(depth):
                x = BiFormerBlock(dim, dim // self.head_dim,
                                  n_win=self.n_win, topk=topk,
                                  mlp_ratio=self.mlp_ratio,
                                  name=f"stage{s}_blk{i}")(x)
            # timm LayerNorm2d default eps=1e-6 (extra_norms)
            outs.append(LayerNorm(eps=1e-6, name=f"extra_norm{s}")(x))
        return outs


class BiDAEFormer(nn.Module):
    """BiFormer encoder + DAEFormer decoder. Input (B,H,W,1|3) ->
    logits (B,H,W,num_classes)."""
    num_classes: int = 9
    head_count: int = 1
    token_mlp: str = "mix_skip"
    dims: Sequence[int] = (128, 320, 512)
    depths: Sequence[int] = (4, 18, 4)
    topks: Sequence[int] = (1, 16, -2)

    @nn.compact
    def __call__(self, x):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        e0, e1, e2 = BiFormer3Out(dims=self.dims, depths=self.depths,
                                  topks=self.topks, name="backbone")(x)
        d0, d1, d2 = self.dims
        t2 = DecoderLayer(d2, d2, d2, d2, d2, self.num_classes,
                          self.head_count, self.token_mlp,
                          name="decoder_2")(e2)
        t1 = DecoderLayer(d1, d1, d1, d1, d2 // 2, self.num_classes,
                          self.head_count, self.token_mlp,
                          name="decoder_1")(map_to_tokens(t2), e1)
        t0 = DecoderLayer(d0 // 2, d0, d0, d0, d1 // 2, self.num_classes,
                          self.head_count, self.token_mlp, is_last=True,
                          name="decoder_0")(t1, e0)
        return t0
