"""DAEFormer — dual-attention (efficient + channel) transformer net.

Reference parity targets (re-derived):
  /root/reference/2D/networks/DAEFormer.py
    EfficientAttention (:86-137): linear attention — softmax over keys
      (token axis) and queries (channel axis), context = K·Vᵀ on the MXU.
    ChannelAttention (:139-179): XCA-style — L2-normalised Qᵀ·K over
      channels with a learned per-head temperature.
    DualTransformerBlock (:182-228): norm→efficient-attn→MixFFN→
      norm→channel-attn→MixFFN, all residual.
    Cross_Attention/CrossAttentionBlock (:10-84): skip fusion — K/Q from
      the skip, V from the decoder stream, output reprojected to 2D and
      added to concat(x1, x2).
    MiT 3-stage encoder (:231-296; dims [128,320,512], layers [2,2,2]),
    MyDecoderLayer (:355-421), DAEFormer (:423-482).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from deformablelka_tpu.nn.layers import Conv2d, Linear
from deformablelka_tpu.nn.norms import LayerNorm
from deformablelka_tpu.nn.segformer import (
    MixFFN, MixFFN_skip, MLP_FFN, OverlapPatchEmbeddings, tokens_to_map,
    map_to_tokens)
from deformablelka_tpu.models.maxvit_dlka import (
    PatchExpand, FinalPatchExpand_X4)


def _ffn(token_mlp, c1, c2, name):
    if token_mlp == "mix":
        return MixFFN(c1, c2, name=name)
    if token_mlp == "mix_skip":
        return MixFFN_skip(c1, c2, name=name)
    return MLP_FFN(c1, c2, name=name)


class EfficientAttention(nn.Module):
    """Linear attention (DAEFormer.py:86-137), NHWC map in/out."""
    in_channels: int
    key_channels: int
    value_channels: int
    head_count: int = 1

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        N = H * W
        keys = map_to_tokens(Conv2d(self.key_channels, (1, 1),
                                    name="keys")(x))
        queries = map_to_tokens(Conv2d(self.key_channels, (1, 1),
                                       name="queries")(x))
        values = map_to_tokens(Conv2d(self.value_channels, (1, 1),
                                      name="values")(x))
        hk = self.key_channels // self.head_count
        hv = self.value_channels // self.head_count
        outs = []
        for i in range(self.head_count):
            k = nn.softmax(keys[..., i * hk:(i + 1) * hk], axis=1)
            q = nn.softmax(queries[..., i * hk:(i + 1) * hk], axis=-1)
            v = values[..., i * hv:(i + 1) * hv]
            context = jnp.einsum("bnk,bnv->bkv", k, v)
            out = jnp.einsum("bnk,bkv->bnv", q, context)
            outs.append(out)
        agg = jnp.concatenate(outs, axis=-1).reshape(
            B, H, W, self.value_channels)
        return Conv2d(self.in_channels, (1, 1), name="reprojection")(agg)


class ChannelAttention(nn.Module):
    """XCA-style transpose attention (DAEFormer.py:139-179)."""
    dim: int
    num_heads: int = 8

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        h = self.num_heads
        temperature = self.param("temperature", nn.initializers.ones,
                                 (h, 1, 1))
        qkv = Linear(3 * C, use_bias=False, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, h, C // h)
        q = jnp.moveaxis(qkv[:, :, 0], 1, -1)   # (B, h, C//h, N)... via
        q = qkv[:, :, 0].transpose(0, 2, 3, 1)  # (B, h, C//h, N)
        k = qkv[:, :, 1].transpose(0, 2, 3, 1)
        v = qkv[:, :, 2].transpose(0, 2, 3, 1)
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
        attn = jnp.einsum("bhcn,bhdn->bhcd", q, k) * temperature
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhcd,bhdn->bhcn", attn, v)
        out = out.transpose(0, 3, 1, 2).reshape(B, N, C)
        return Linear(C, name="proj")(out)


class DualTransformerBlock(nn.Module):
    in_dim: int
    key_dim: int
    value_dim: int
    head_count: int = 1
    token_mlp: str = "mix_skip"

    @nn.compact
    def __call__(self, x, H, W):
        n1 = LayerNorm(name="norm1")(x)
        attn = EfficientAttention(self.in_dim, self.key_dim,
                                  self.value_dim, self.head_count,
                                  name="attn")(tokens_to_map(n1, H, W))
        add1 = x + map_to_tokens(attn)
        m1 = _ffn(self.token_mlp, self.in_dim, self.in_dim * 4, "mlp1")
        add2 = add1 + (m1(LayerNorm(name="norm2")(add1), H, W)
                       if self.token_mlp != "mlp"
                       else m1(LayerNorm(name="norm2")(add1)))
        ca = ChannelAttention(self.in_dim, name="channel_attn")(
            LayerNorm(name="norm3")(add2))
        add3 = add2 + ca
        m2 = _ffn(self.token_mlp, self.in_dim, self.in_dim * 4, "mlp2")
        return add3 + (m2(LayerNorm(name="norm4")(add3), H, W)
                       if self.token_mlp != "mlp"
                       else m2(LayerNorm(name="norm4")(add3)))


class CrossAttention(nn.Module):
    """Cross_Attention (DAEFormer.py:10-47): K/Q from x2 (skip), V from
    x1; context/attended on the MXU; output reprojected D→2D."""
    key_channels: int
    value_channels: int
    head_count: int = 1

    @nn.compact
    def __call__(self, x1, x2, H, W):
        B, N, D = x1.shape
        hk = self.key_channels // self.head_count
        hv = self.value_channels // self.head_count
        outs = []
        for i in range(self.head_count):
            k = nn.softmax(x2[..., i * hk:(i + 1) * hk], axis=1)
            q = nn.softmax(x2[..., i * hk:(i + 1) * hk], axis=-1)
            v = x1[..., i * hv:(i + 1) * hv]
            context = jnp.einsum("bnk,bnv->bkv", k, v)
            outs.append(jnp.einsum("bnk,bkv->bnv", q, context))
        agg = jnp.concatenate(outs, axis=-1).reshape(B, H, W, D)
        rep = Conv2d(2 * self.value_channels, (1, 1),
                     name="reprojection")(agg)
        return LayerNorm(name="norm")(map_to_tokens(rep))


class CrossAttentionBlock(nn.Module):
    in_dim: int
    key_dim: int
    value_dim: int
    head_count: int = 1
    token_mlp: str = "mix_skip"

    @nn.compact
    def __call__(self, x1, x2, H, W):
        norm = LayerNorm(name="norm1")
        attn = CrossAttention(self.key_dim, self.value_dim,
                              self.head_count, name="attn")(
            norm(x1), norm(x2), H, W)
        tx = jnp.concatenate([x1, x2], axis=-1) + attn
        m = _ffn(self.token_mlp, self.in_dim * 2, self.in_dim * 4, "mlp")
        n2 = LayerNorm(name="norm2")(tx)
        return tx + (m(n2, H, W) if self.token_mlp != "mlp" else m(n2))


class MiT3(nn.Module):
    """3-stage dual-attention encoder (DAEFormer.py:231-296)."""
    dims: Sequence[int] = (128, 320, 512)
    layers: Sequence[int] = (2, 2, 2)
    head_count: int = 1
    token_mlp: str = "mix_skip"

    @nn.compact
    def __call__(self, x):
        patch = (7, 3, 3)
        strides = (4, 2, 2)
        pads = (3, 1, 1)
        outs = []
        h = x
        for s in range(3):
            t, H, W = OverlapPatchEmbeddings(
                patch[s], strides[s], pads[s], self.dims[s],
                name=f"patch_embed{s + 1}")(h)
            for i in range(self.layers[s]):
                t = DualTransformerBlock(
                    self.dims[s], self.dims[s], self.dims[s],
                    self.head_count, self.token_mlp,
                    name=f"block{s + 1}_{i}")(t, H, W)
            t = LayerNorm(name=f"norm{s + 1}")(t)
            h = tokens_to_map(t, H, W)
            outs.append(h)
        return outs


class DecoderLayer(nn.Module):
    """MyDecoderLayer (DAEFormer.py:355-421)."""
    dims: int
    out_dim: int
    key_dim: int
    value_dim: int
    x1_dim: int
    n_class: int = 9
    head_count: int = 1
    token_mlp: str = "mix_skip"
    is_last: bool = False

    @nn.compact
    def __call__(self, x1, x2=None):
        if x2 is None:
            B, H, W, C = x1.shape
            return PatchExpand(name="layer_up")(x1)
        B, H, W, C = x2.shape
        x2t = map_to_tokens(x2)
        x1e = Linear(self.out_dim, name="x1_linear")(x1)
        ca_dim = self.dims * 2 if self.is_last else self.dims
        ca = CrossAttentionBlock(ca_dim, self.key_dim, self.value_dim,
                                 self.head_count, self.token_mlp,
                                 name="cross_attn")(x1e, x2t, H, W)
        cat = Linear(self.out_dim, name="concat_linear")(ca)
        t = DualTransformerBlock(self.out_dim, self.key_dim,
                                 self.value_dim, self.head_count,
                                 self.token_mlp,
                                 name="layer_former_1")(cat, H, W)
        t = DualTransformerBlock(self.out_dim, self.key_dim,
                                 self.value_dim, self.head_count,
                                 self.token_mlp,
                                 name="layer_former_2")(t, H, W)
        if self.is_last:
            m = FinalPatchExpand_X4(name="layer_up")(
                t.reshape(B, H, W, self.out_dim))
            return Conv2d(self.n_class, (1, 1), name="last_layer")(m)
        m = PatchExpand(name="layer_up")(t.reshape(B, H, W, self.out_dim))
        return map_to_tokens(m)


class DAEFormer(nn.Module):
    """DAEFormer (DAEFormer.py:423-482). Input (B,H,W,1|3) →
    (B,H,W,n_class)."""
    num_classes: int = 9
    head_count: int = 1
    token_mlp: str = "mix_skip"
    dims: Sequence[int] = (128, 320, 512)
    layers: Sequence[int] = (2, 2, 2)

    @nn.compact
    def __call__(self, x):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        e0, e1, e2 = MiT3(self.dims, self.layers, self.head_count,
                          self.token_mlp, name="backbone")(x)
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
