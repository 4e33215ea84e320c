"""SegFormer-style op library + MiT encoder (flax, channels-last).

Reference parity targets (re-derived):
  /root/reference/2D/networks/segformer.py
    EfficientSelfAtten (:8-40): q from tokens, k/v from a
      reduction_ratio-strided conv of the map + LayerNorm.
    SelfAtten (:44-66), Scale_reduce + M_EfficientSelfAtten (:69-178):
      multi-scale bridge attention over the concatenation of all four
      stage token maps (56²·C + 28²·2C + 14²·5C + 7²·8C with dims folded
      so every scale carries C channels per token group).
    DWConv (:180-190), MixFFN (:192-204), MixFFN_skip (:206-221,
      adds the skip + LayerNorm inside the FFN), MLP_FFN (:223-234),
      OverlapPatchEmbeddings (:305-318), TransformerBlock (:320-337),
      MiT (:374-455), SegFormer decoder (:540-…).

Tokens are (B, N, C); every spatial op reshapes through (B, H, W, C).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from deformablelka_tpu.nn.layers import Conv2d, Linear, gelu
from deformablelka_tpu.nn.norms import LayerNorm, BatchNorm


def tokens_to_map(x, H, W):
    B, N, C = x.shape
    return x.reshape(B, H, W, C)


def map_to_tokens(x):
    B, H, W, C = x.shape
    return x.reshape(B, H * W, C)


class EfficientSelfAtten(nn.Module):
    dim: int
    head: int
    reduction_ratio: int = 1

    @nn.compact
    def __call__(self, x, H, W):
        B, N, C = x.shape
        hd = self.head
        q = Linear(C, name="q")(x).reshape(B, N, hd, C // hd)
        kv_in = x
        if self.reduction_ratio > 1:
            r = self.reduction_ratio
            m = tokens_to_map(x, H, W)
            m = Conv2d(C, (r, r), stride=r, padding=0, name="sr")(m)
            kv_in = LayerNorm(name="norm")(map_to_tokens(m))
        kv = Linear(2 * C, name="kv")(kv_in)
        M = kv.shape[1]
        kv = kv.reshape(B, M, 2, hd, C // hd)
        k, v = kv[:, :, 0], kv[:, :, 1]
        attn = jnp.einsum("bnhc,bmhc->bhnm", q, k) * (C // hd) ** -0.5
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhc->bnhc", attn, v).reshape(B, N, C)
        return Linear(C, name="proj")(out)


class SelfAtten(nn.Module):
    dim: int
    head: int

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        hd = self.head
        q = Linear(C, name="q")(x).reshape(B, N, hd, C // hd)
        kv = Linear(2 * C, name="kv")(x).reshape(B, N, 2, hd, C // hd)
        k, v = kv[:, :, 0], kv[:, :, 1]
        attn = jnp.einsum("bnhc,bmhc->bhnm", q, k) * (C // hd) ** -0.5
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhc->bnhc", attn, v).reshape(B, N, C)
        return Linear(C, name="proj")(out)


class ScaleReduce(nn.Module):
    """Scale_reduce (segformer.py:69-110) for the 4-scale bridge: token
    segments are the 4 stage maps flattened with channel folding so each
    carries `dim` channels; scales 1/2/3 are conv-downsampled by their
    reduction ratio before K/V."""
    dim: int
    reduction_ratio: Sequence[int]  # e.g. (1, 2, 4, 8)
    spatial: Sequence[int] = (56, 28, 14, 7)
    folds: Sequence[int] = (1, 2, 5, 8)

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        rr = list(self.reduction_ratio)
        segs = []
        start = 0
        pieces = []
        for i, (hw, fold) in enumerate(zip(self.spatial, self.folds)):
            n_i = hw * hw * fold
            seg = x[:, start:start + n_i, :]
            start += n_i
            if i < len(self.spatial) - 1:
                r = rr[len(rr) - 1 - i]
                m = seg.reshape(B, hw, hw, C * fold)
                m = Conv2d(C * fold, (r, r), stride=r, padding=0,
                           name=f"sr{i}")(m)
                seg = m.reshape(B, -1, C)
            pieces.append(seg)
        out = jnp.concatenate(pieces, axis=1)
        return LayerNorm(name="norm")(out)


class MEfficientSelfAtten(nn.Module):
    """M_EfficientSelfAtten (segformer.py:113-178): bridge attention with
    multi-scale K/V reduction."""
    dim: int
    head: int
    reduction_ratio: Sequence[int] = (1, 2, 4, 8)
    spatial: Sequence[int] = (56, 28, 14, 7)
    folds: Sequence[int] = (1, 2, 5, 8)

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        hd = self.head
        q = Linear(C, name="q")(x).reshape(B, N, hd, C // hd)
        kv_in = ScaleReduce(self.dim, self.reduction_ratio, self.spatial,
                            self.folds, name="scale_reduce")(x)
        M = kv_in.shape[1]
        kv = Linear(2 * C, name="kv")(kv_in).reshape(B, M, 2, hd, C // hd)
        k, v = kv[:, :, 0], kv[:, :, 1]
        attn = jnp.einsum("bnhc,bmhc->bhnm", q, k) * (C // hd) ** -0.5
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhc->bnhc", attn, v).reshape(B, N, C)
        return Linear(C, name="proj")(out)


class DWConv(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, H, W):
        m = tokens_to_map(x, H, W)
        m = Conv2d(self.dim, (3, 3), padding=1, groups=self.dim,
                   name="dwconv")(m)
        return map_to_tokens(m)


class MixFFN(nn.Module):
    c1: int
    c2: int

    @nn.compact
    def __call__(self, x, H, W):
        h = Linear(self.c2, name="fc1")(x)
        h = gelu(DWConv(self.c2, name="dwconv")(h, H, W))
        return Linear(self.c1, name="fc2")(h)


class MixFFN_skip(nn.Module):
    """MixFFN with in-FFN skip + LayerNorm (segformer.py:206-221)."""
    c1: int
    c2: int

    @nn.compact
    def __call__(self, x, H, W):
        h = Linear(self.c2, name="fc1")(x)
        d = DWConv(self.c2, name="dwconv")(h, H, W)
        h = gelu(LayerNorm(name="norm1")(d + h))
        return Linear(self.c1, name="fc2")(h)


class MLP_FFN(nn.Module):
    c1: int
    c2: int

    @nn.compact
    def __call__(self, x):
        return Linear(self.c1, name="fc2")(gelu(
            Linear(self.c2, name="fc1")(x)))


class OverlapPatchEmbeddings(nn.Module):
    patch_size: int = 7
    stride: int = 4
    padding: int = 3
    dim: int = 768

    @nn.compact
    def __call__(self, x):
        m = Conv2d(self.dim, (self.patch_size, self.patch_size),
                   stride=self.stride, padding=self.padding,
                   name="proj")(x)
        B, H, W, C = m.shape
        t = LayerNorm(name="norm")(m.reshape(B, H * W, C))
        return t, H, W


class SegFormerBlock(nn.Module):
    """segformer.py TransformerBlock (:320-337)."""
    dim: int
    head: int
    reduction_ratio: int = 1
    token_mlp: str = "mix_skip"

    @nn.compact
    def __call__(self, x, H, W):
        a = EfficientSelfAtten(self.dim, self.head, self.reduction_ratio,
                               name="attn")(LayerNorm(name="norm1")(x),
                                            H, W)
        x = x + a
        n = LayerNorm(name="norm2")(x)
        if self.token_mlp == "mix":
            m = MixFFN(self.dim, self.dim * 4, name="mlp")(n, H, W)
        elif self.token_mlp == "mix_skip":
            m = MixFFN_skip(self.dim, self.dim * 4, name="mlp")(n, H, W)
        else:
            m = MLP_FFN(self.dim, self.dim * 4, name="mlp")(n)
        return x + m


class MiT(nn.Module):
    """Mix-Transformer encoder (segformer.py:374-455): 4 stages of
    overlap patch-embed + SegFormer blocks; returns 4 NHWC maps."""
    dims: Sequence[int] = (64, 128, 320, 512)
    layers: Sequence[int] = (2, 2, 2, 2)
    token_mlp: str = "mix_skip"

    @nn.compact
    def __call__(self, x):
        patch = (7, 3, 3, 3)
        strides = (4, 2, 2, 2)
        pads = (3, 1, 1, 1)
        rr = (8, 4, 2, 1)
        heads = (1, 2, 5, 8)
        outs = []
        h = x
        for s in range(4):
            t, H, W = OverlapPatchEmbeddings(
                patch[s], strides[s], pads[s], self.dims[s],
                name=f"patch_embed{s + 1}")(h)
            for i in range(self.layers[s]):
                t = SegFormerBlock(self.dims[s], heads[s], rr[s],
                                   self.token_mlp,
                                   name=f"block{s + 1}_{i}")(t, H, W)
            t = LayerNorm(name=f"norm{s + 1}")(t)
            h = tokens_to_map(t, H, W)
            outs.append(h)
        return outs


class SegFormer(nn.Module):
    """All-MLP decode head over MiT features (segformer.py:540-…).

    upsample_to_input=False reproduces the reference file exactly: its
    forward returns logits at the /4 (c1) resolution with no final
    upsample (segformer.py:585-…); True (default) adds the x4 bilinear
    to input resolution for direct training/inference use."""
    num_classes: int = 9
    dims: Sequence[int] = (64, 128, 320, 512)
    layers: Sequence[int] = (2, 2, 2, 2)
    embed_dim: int = 256
    upsample_to_input: bool = True

    @nn.compact
    def __call__(self, x):
        import jax
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        feats = MiT(self.dims, self.layers, name="backbone")(x)
        B = x.shape[0]
        H0, W0 = feats[0].shape[1:3]
        ups = []
        for i, f in enumerate(feats):
            t = Linear(self.embed_dim, name=f"linear_c{i + 1}")(
                map_to_tokens(f))
            m = t.reshape(B, f.shape[1], f.shape[2], self.embed_dim)
            if (f.shape[1], f.shape[2]) != (H0, W0):
                m = jax.image.resize(m, (B, H0, W0, self.embed_dim),
                                     "bilinear")
            ups.append(m)
        fused = jnp.concatenate(ups[::-1], axis=-1)
        fused = Conv2d(self.embed_dim, (1, 1), use_bias=False,
                       name="linear_fuse")(fused)
        fused = nn.relu(BatchNorm(name="bn")(fused))
        logits = Conv2d(self.num_classes, (1, 1), name="linear_pred")(fused)
        if not self.upsample_to_input:
            return logits
        out_hw = (x.shape[1], x.shape[2])
        return jax.image.resize(
            logits, (B, *out_hw, self.num_classes), "bilinear")
