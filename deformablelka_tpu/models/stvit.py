"""STViT — Super-Token Vision Transformer encoder + LKA decoder.

Parity targets (re-derived):
  /root/reference/2D/networks/STViTLayers.py
    Attention (:58-112): cross attention, q from x / kv from y, optional
    window rel-pos bias, additive mask.
    Block (:114-153): pre-norm attn + MLP with layer-scale 1e-5; local
    variant partitions into window_size windows (no shift, no pad).
    SemanticAttentionBlock (:155-238): super-token sampling — each
    window_size x window_size window is adaptive-max-pooled to
    window_sample_size^2 "semantic" query tokens (multi_scale_semantic_
    token1, :448-459); keys/values are overlapping k_window_size patches
    extracted with stride window_size (torch F.unfold); per-window cross
    attention with layer-scale and an out-of-image additive pad mask;
    output is the semantic-token grid (B, (H/ws*s)^2, C).
    RestoreBlock (:240-318): inverse — image-token windows query
    k_window_size patches of the semantic grid (stride
    window_sample_size), restoring the full-resolution stream.
    PatchEmbed (:394-445): two 3x3/2 conv+BN (+hardswish) halvings.
  /root/reference/2D/networks/STViTEncoder_LKADecoder.py
    Deit stage (:412-543): depth-6 pattern [SwinBlock, Semantic(k1=14),
    Semantic(k2=21), Block(local), Block(global), Restore(k=27)] on the
    image/semantic token pair, then PatchMerging.
    SwinTransformer backbone (:616-836): stages = BasicLayer(2, d96),
    BasicLayer(2, d192), Deit(6, d384), BasicLayer(2, d768), per-output
    LayerNorm — feature pyramid 96/192/384/768 at /4../32.
    STVitLKA (:1117-1191): that backbone + the shared LKA decoder
    (MyDecoderLayer with LKABlock; reused from models/maxvit_dlka).

TPU notes: every token regrouping here is a static reshape/transpose;
the overlapping key-window extraction (torch F.unfold) is a stack of
static strided slices — exact data movement, where a one-hot-filter
conv would round values to bf16 on the MXU; the pad masks are
compile-time numpy constants. At 224 input no window padding occurs and
the reference's uniform -1000 masks are softmax no-ops, which we skip.

Swin pieces (SwinBlock with shifted windows, PatchMerging) are reused
from models/swinunet.py.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from deformablelka_tpu.nn.layers import Conv2d, Linear, gelu
from deformablelka_tpu.nn.norms import LayerNorm, BatchNorm
from deformablelka_tpu.models.swinunet import SwinBlock, PatchMerging


def adaptive_max_pool(x, out_size: int):
    """torch adaptive_max_pool2d on NHWC maps (static bin slices)."""
    B, H, W, C = x.shape
    rows = []
    for i in range(out_size):
        h0, h1 = (i * H) // out_size, -(-((i + 1) * H) // out_size)
        cols = []
        for j in range(out_size):
            w0, w1 = (j * W) // out_size, -(-((j + 1) * W) // out_size)
            cols.append(x[:, h0:h1, w0:w1].max(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, out, out, C)


def extract_patches(x, k: int, stride: int, pad_lo: int, pad_hi: int):
    """torch F.unfold(pad(x)) -> (B, nW, k*k, C); windows row-major.

    Static strided slices (exact data movement — a one-hot-filter conv
    would round the values to bf16 on the TPU MXU)."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi), (0, 0)))
    Hp, Wp = H + pad_lo + pad_hi, W + pad_lo + pad_hi
    nh = (Hp - k) // stride + 1
    nw = (Wp - k) // stride + 1
    rows = []
    for i in range(nh):
        for j in range(nw):
            rows.append(xp[:, i * stride:i * stride + k,
                           j * stride:j * stride + k])
    p = jnp.stack(rows, axis=1)  # (B, nW, k, k, C)
    return p.reshape(B, nh * nw, k * k, C)


class CrossAttention(nn.Module):
    """STViTLayers.Attention — q from x, k/v from y, optional mask."""
    dim: int
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, y, mask=None):
        B, N1, C = x.shape
        N2 = y.shape[1]
        h = self.num_heads
        hd = C // h
        q = Linear(C, use_bias=self.qkv_bias, name="q")(x)
        kv = Linear(2 * C, use_bias=self.qkv_bias, name="kv")(y)
        q = q.reshape(B, N1, h, hd).transpose(0, 2, 1, 3)
        k, v = kv.reshape(B, N2, 2, h, hd).transpose(2, 0, 3, 1, 4)
        attn = jnp.einsum("bhqc,bhkc->bhqk", q, k) * hd ** -0.5
        if mask is not None:
            attn = attn + mask
        attn = nn.softmax(attn, axis=-1)
        o = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, N1, C)
        return Linear(C, name="proj")(o)


class STViTBlock(nn.Module):
    """STViTLayers.Block — self-attention (global or local windows)
    with layer-scale 1e-5."""
    dim: int
    num_heads: int
    window_size: int = 3
    local: bool = False
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, H, W):
        B, L, C = x.shape
        ls1 = self.param("layer_scale_1",
                         nn.initializers.constant(1e-5), (C,))
        ls2 = self.param("layer_scale_2",
                         nn.initializers.constant(1e-5), (C,))
        n = LayerNorm(name="norm1")(x)
        if self.local:
            ws = self.window_size
            n = n.reshape(B, H // ws, ws, W // ws, ws, C)
            n = n.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)
            a = CrossAttention(self.dim, self.num_heads, name="attn")(n, n)
            a = a.reshape(B, H // ws, W // ws, ws, ws, C)
            a = a.transpose(0, 1, 3, 2, 4, 5).reshape(B, L, C)
        else:
            a = CrossAttention(self.dim, self.num_heads, name="attn")(n, n)
        x = x + ls1 * a
        n2 = LayerNorm(name="norm2")(x)
        m = Linear(int(C * self.mlp_ratio), name="fc1")(n2)
        m = Linear(C, name="fc2")(gelu(m))
        return x + ls2 * m


def _pad_mask(Hp, Wp, pad_b, pad_r, k, stride, pad_lo, pad_hi, n_q):
    """Reference pad-mask (STViTLayers.py:246-258 semantics) as a
    compile-time constant; None when it is a softmax no-op."""
    if pad_b == 0 and pad_r == 0:
        return None
    core = np.zeros((Hp, Wp), np.float32)
    rs = slice(-pad_b, None) if pad_b > 0 else slice(None)
    cs = slice(-pad_r, None) if pad_r > 0 else slice(None)
    core[rs, cs] = -1000.0
    core = np.pad(core, ((pad_lo, pad_hi), (pad_lo, pad_hi)),
                  constant_values=-1000.0)
    nW_h = (core.shape[0] - k) // stride + 1
    nW_w = (core.shape[1] - k) // stride + 1
    wins = np.zeros((nW_h * nW_w, k * k), np.float32)
    for i in range(nW_h):
        for j in range(nW_w):
            w = core[i * stride:i * stride + k, j * stride:j * stride + k]
            wins[i * nW_w + j] = w.reshape(-1)
    # (nW, 1, n_q, k*k): broadcast over batch and heads
    return jnp.asarray(wins)[:, None, None, :] * np.ones((1, 1, n_q, 1),
                                                         np.float32)


class SemanticAttentionBlock(nn.Module):
    """Super-token sampling (STViTLayers.py:155-238)."""
    dim: int
    num_heads: int
    window_size: int = 7
    window_sample_size: int = 3
    k_window_size: int = 14
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, H, W, y=None):
        B, L, C = x.shape
        ws, ss, kws = self.window_size, self.window_sample_size, \
            self.k_window_size
        x = x.reshape(B, H, W, C)
        pad_r = (-W) % ws
        pad_b = (-H) % ws
        if pad_r or pad_b:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r
        nwh, nww = Hp // ws, Wp // ws
        s_H, s_W = nwh * ss, nww * ss

        if y is None:
            wins = x.reshape(B, nwh, ws, nww, ws, C)
            wins = wins.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
            shortcut = adaptive_max_pool(wins, ss).reshape(-1, ss * ss, C)
        else:
            yw = y.reshape(B, nwh, ss, nww, ss, C)
            shortcut = yw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ss * ss, C)
        norm1 = LayerNorm(name="norm1")
        pool_q = norm1(shortcut)

        left = (kws - ws) // 2
        right = kws - ws - left
        kwin = extract_patches(x, kws, ws, left, right)
        kwin = norm1(kwin.reshape(B, -1, C)).reshape(-1, kws * kws, C)
        mask = _pad_mask(Hp, Wp, pad_b, pad_r, kws, ws, left, right,
                         ss * ss)
        if mask is not None:
            mask = jnp.tile(mask, (B, 1, 1, 1))

        ls1 = self.param("layer_scale_1",
                         nn.initializers.constant(1e-5), (C,))
        ls2 = self.param("layer_scale_2",
                         nn.initializers.constant(1e-5), (C,))
        s = shortcut + ls1 * CrossAttention(
            self.dim, self.num_heads, name="attn")(pool_q, kwin, mask)
        s = s.reshape(B, nwh, nww, ss, ss, C)
        s = s.transpose(0, 1, 3, 2, 4, 5).reshape(B, s_H * s_W, C)
        n2 = LayerNorm(name="norm2")(s)
        m = Linear(int(C * self.mlp_ratio), name="fc1")(n2)
        m = Linear(C, name="fc2")(gelu(m))
        return s + ls2 * m, s_H, s_W


class RestoreBlock(nn.Module):
    """Semantic -> image-token restoration (STViTLayers.py:240-318)."""
    dim: int
    num_heads: int
    window_size: int = 7
    window_sample_size: int = 3
    k_window_size: int = 27
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, y, H, W):
        B, L, C = x.shape
        ws, ss, kws = self.window_size, self.window_sample_size, \
            self.k_window_size
        x = x.reshape(B, H, W, C)
        pad_r = (-W) % ws
        pad_b = (-H) % ws
        if pad_r or pad_b:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r
        nwh, nww = Hp // ws, Wp // ws
        s_H, s_W = nwh * ss, nww * ss

        wins = x.reshape(B, nwh, ws, nww, ws, C)
        shortcut = wins.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)
        norm1 = LayerNorm(name="norm1")
        q = norm1(shortcut)

        yg = y.reshape(B, s_H, s_W, C)
        left = (kws - ss) // 2
        right = kws - ss - left
        kwin = extract_patches(yg, kws, ss, left, right)
        kwin = norm1(kwin.reshape(B, -1, C)).reshape(-1, kws * kws, C)
        mask = _pad_mask(s_H, s_W, pad_b, pad_r, kws, ss, left, right,
                         ws * ws)
        if mask is not None:
            mask = jnp.tile(mask, (B, 1, 1, 1))

        ls1 = self.param("layer_scale_1",
                         nn.initializers.constant(1e-5), (C,))
        ls2 = self.param("layer_scale_2",
                         nn.initializers.constant(1e-5), (C,))
        o = shortcut + ls1 * CrossAttention(
            self.dim, self.num_heads, name="attn")(q, kwin, mask)
        o = o.reshape(B, nwh, nww, ws, ws, C)
        o = o.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
        o = o[:, :H, :W].reshape(B, H * W, C)
        n2 = LayerNorm(name="norm2")(o)
        m = Linear(int(C * self.mlp_ratio), name="fc1")(n2)
        m = Linear(C, name="fc2")(gelu(m))
        return o + ls2 * m


class DeitStage(nn.Module):
    """Depth-6 super-token stage (STViTEncoder_LKADecoder.py:412-543):
    Swin -> Semantic(k1) -> Semantic(k2) -> local Block -> global Block
    -> Restore(k)."""
    dim: int
    num_heads: int
    window_size: int = 7
    window_sample_size: int = 3
    k_window_size_1: int = 14
    k_window_size_2: int = 21
    restore_k_window_size: int = 27
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, H, W):
        x = SwinBlock(self.dim, self.num_heads,
                      window_size=self.window_size, shift_size=0,
                      mlp_ratio=self.mlp_ratio, name="blk0")(x, H, W)
        s, s_H, s_W = SemanticAttentionBlock(
            self.dim, self.num_heads, self.window_size,
            self.window_sample_size, self.k_window_size_1,
            self.mlp_ratio, name="blk1")(x, H, W)
        s, _, _ = SemanticAttentionBlock(
            self.dim, self.num_heads, self.window_size,
            self.window_sample_size, self.k_window_size_2,
            self.mlp_ratio, name="blk2")(x, H, W, y=s)
        s = STViTBlock(self.dim, self.num_heads,
                       window_size=self.window_sample_size, local=True,
                       mlp_ratio=self.mlp_ratio, name="blk3")(s, s_H, s_W)
        s = STViTBlock(self.dim, self.num_heads,
                       window_size=self.window_sample_size, local=False,
                       mlp_ratio=self.mlp_ratio, name="blk4")(s, s_H, s_W)
        x = RestoreBlock(self.dim, self.num_heads, self.window_size,
                         self.window_sample_size,
                         self.restore_k_window_size,
                         self.mlp_ratio, name="blk5")(x, s, H, W)
        return x


class STViT4Out(nn.Module):
    """STViT backbone: Swin stages with stage 2 replaced by the
    super-token Deit stage; 4-scale NHWC outputs."""
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    window_sample_size: int = 3
    k_window_size_1: int = 14
    k_window_size_2: int = 21
    restore_k_window_size: int = 27
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        # PatchEmbed: 3x3/2 conv-BN-hardswish twice (STViTLayers:394-445)
        h = Conv2d(self.embed_dim // 2, 3, stride=2,
                   padding=((1, 1), (1, 1)), use_bias=False,
                   name="stem_conv1")(x)
        h = jax.nn.hard_swish(BatchNorm(name="stem_bn1")(h))
        h = Conv2d(self.embed_dim, 3, stride=2, padding=((1, 1), (1, 1)),
                   use_bias=False, name="stem_conv2")(h)
        h = jax.nn.hard_swish(BatchNorm(name="stem_bn2")(h))
        H = h.shape[1]
        W = h.shape[2]
        t = h.reshape(B, H * W, self.embed_dim)

        outs = []
        dim = self.embed_dim
        for stage in range(4):
            heads = self.num_heads[stage]
            if stage == 2:
                t = DeitStage(dim, heads, self.window_size,
                              self.window_sample_size,
                              self.k_window_size_1, self.k_window_size_2,
                              self.restore_k_window_size, self.mlp_ratio,
                              name=f"stage{stage}")(t, H, W)
            else:
                for i in range(self.depths[stage]):
                    # det-Swin: shifted blocks shift even on a
                    # single-window map (stage 3 at 7×7)
                    t = SwinBlock(dim, heads,
                                  window_size=self.window_size,
                                  shift_size=0 if i % 2 == 0 else
                                  self.window_size // 2,
                                  mlp_ratio=self.mlp_ratio,
                                  clamp_shift=False,
                                  name=f"stage{stage}_blk{i}")(t, H, W)
            out = LayerNorm(name=f"norm{stage}")(t)
            outs.append(out.reshape(B, H, W, dim))
            if stage < 3:
                t = PatchMerging(dim, name=f"downsample{stage}")(t, H, W)
                H, W = H // 2, W // 2
                dim *= 2
        return outs


class STVitLKA(nn.Module):
    """STViT encoder + LKA decoder (STViTEncoder_LKADecoder.py:1117).

    Input (B,H,W,1|3) -> logits (B,H,W,num_classes)."""
    num_classes: int = 9
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        from deformablelka_tpu.models.maxvit_dlka import DecoderLayer
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        e0, e1, e2, e3 = STViT4Out(embed_dim=self.embed_dim,
                                   depths=self.depths,
                                   num_heads=self.num_heads,
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


class SemanticSTViT(nn.Module):
    """Pure STViT encoder-decoder segmentation net (STViTSegmentation.py
    :1182-1495): 7 stages, no skip connections — Swin(2)@96/56 ->
    Swin(2)@192/28 -> Deit(6)@384/14 -> Swin(depth3)@768/7+expand ->
    Deit(6)@384/14+expand -> Swin(2)@192/28+expand -> Swin(2)@96/56 +
    FinalPatchExpand_X4 -> 1x1 head. depths [2,2,6,6,2,2,2], heads
    [3,6,12,24,12,6,3] (:1214-1216)."""
    num_classes: int = 9
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 6, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24, 12, 6, 3)
    window_size: int = 7

    def _swin(self, t, H, W, dim, heads, depth, name):
        for i in range(depth):
            # det-Swin semantics: shifted blocks shift even when the
            # map is one window (dec3 runs at 7×7)
            t = SwinBlock(dim, heads, window_size=self.window_size,
                          shift_size=0 if i % 2 == 0 else
                          self.window_size // 2,
                          clamp_shift=False,
                          name=f"{name}_blk{i}")(t, H, W)
        return t

    @nn.compact
    def __call__(self, x):
        from deformablelka_tpu.models.maxvit_dlka import (
            PatchExpand, FinalPatchExpand_X4)
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        B = x.shape[0]
        d = self.embed_dim
        h = Conv2d(d // 2, 3, stride=2, padding=((1, 1), (1, 1)),
                   use_bias=False, name="stem_conv1")(x)
        h = jax.nn.hard_swish(BatchNorm(name="stem_bn1")(h))
        h = Conv2d(d, 3, stride=2, padding=((1, 1), (1, 1)),
                   use_bias=False, name="stem_conv2")(h)
        h = jax.nn.hard_swish(BatchNorm(name="stem_bn2")(h))
        H, W = h.shape[1], h.shape[2]
        t = h.reshape(B, H * W, d)

        # encoder
        t = self._swin(t, H, W, d, self.num_heads[0], self.depths[0],
                       "enc0")
        t = PatchMerging(d, name="down0")(t, H, W)
        H, W = H // 2, W // 2
        t = self._swin(t, H, W, 2 * d, self.num_heads[1], self.depths[1],
                       "enc1")
        t = PatchMerging(2 * d, name="down1")(t, H, W)
        H, W = H // 2, W // 2
        t = DeitStage(4 * d, self.num_heads[2],
                      window_size=self.window_size, name="enc2")(t, H, W)
        t = PatchMerging(4 * d, name="down2")(t, H, W)
        H, W = H // 2, W // 2
        # bottleneck + decoder
        t = self._swin(t, H, W, 8 * d, self.num_heads[3], self.depths[3],
                       "dec3")
        t = PatchExpand(name="up3")(t.reshape(B, H, W, 8 * d))
        H, W = H * 2, W * 2
        t = t.reshape(B, H * W, 4 * d)
        # layer 4 is a depth-2 Deit: [Swin, SemanticAttentionBlock] —
        # but Deit.forward never CONSUMES the blk-1 semantic token at
        # depth 2 (STViTSegmentation.py:1048-1057: it is assigned and
        # dropped; only blk 5 would read it), so the decoder Deit stage
        # reduces to its Swin block. blk-1's params are dead.
        t = SwinBlock(4 * d, self.num_heads[4],
                      window_size=self.window_size, shift_size=0,
                      name="dec4_blk0")(t, H, W)
        t = PatchExpand(name="up4")(t.reshape(B, H, W, 4 * d))
        H, W = H * 2, W * 2
        t = t.reshape(B, H * W, 2 * d)
        t = self._swin(t, H, W, 2 * d, self.num_heads[5], self.depths[5],
                       "dec5")
        t = PatchExpand(name="up5")(t.reshape(B, H, W, 2 * d))
        H, W = H * 2, W * 2
        t = t.reshape(B, H * W, d)
        t = self._swin(t, H, W, d, self.num_heads[6], self.depths[6],
                       "dec6")
        m = FinalPatchExpand_X4(name="up6")(t.reshape(B, H, W, d))
        return Conv2d(self.num_classes, 1, name="last_layer")(m)
