"""TransUNet (TransNorm variant) — R50-ViT-B/16 hybrid, skin baseline.

Parity targets (re-derived):
  /root/reference/2D/skin_code/model/vit_seg_modeling.py
    Attention (:50-102): standard ViT MHA plus a fourth "spatial" head —
    the attention probabilities also aggregate a `spatial` projection,
    `weights = probs @ spatial` (:96-98); the encoder forwards the LAST
    block's spatial stream to the decoder (:244-249).
    Block (:175-195): pre-norm attn/MLP, eps 1e-6.
    Embeddings (:129-173): hybrid ResNetV2 stem -> 1x1-patch conv to
    hidden 768 + learned position embeddings.
    DecoderCup (:359-412): conv_more/conv_att 768->512; 4 DecoderBlocks
    in (512,256,128,64) -> out (256,128,64,16), skips (512,256,64,0)
    (n_skip=3, vit_seg_configs.py:43-59).
    DecoderBlock (:288-331): x2 bilinear (align_corners) upsample of both
    streams, att = Conv2dReLU(up(att)); concat skip; channel attention
    (avg+max pooled MLP gate, :333-349); two 3x3 Conv2dReLU; x *= att.
    SegmentationHead (:351-357) 3x3 conv; forward applies sigmoid (:435).
  /root/reference/2D/skin_code/model/vit_seg_modeling_resnet_skip.py
    StdConv2d weight standardisation (:18-25), PreActBottleneck with
    GroupNorm(32) eps 1e-6 and per-channel gn_proj (:38-74), ResNetV2
    root 7x7/2 + maxpool 3/2 pad 0 with zero-pad size fix (:115-157),
    block_units (3,4,9), width 64; skips returned deepest-first.

TPU notes: the align-corners bilinear x2 upsample is expressed as two
static interpolation matrices contracted on the MXU (no gathers); weight
standardisation happens on the (kh,kw,cin) axes of our HWIO kernels at
trace time, fusing into the conv.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from deformablelka_tpu.nn.layers import Conv2d, Linear, _kaiming_conv, gelu
from deformablelka_tpu.nn.norms import LayerNorm, GroupNorm, BatchNorm


def _upsample_matrix(n_in: int, scale: int) -> np.ndarray:
    """(n_out, n_in) align_corners=True linear interpolation matrix."""
    n_out = n_in * scale
    m = np.zeros((n_out, n_in), np.float32)
    if n_in == 1:
        m[:, 0] = 1.0
        return m
    src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    w = (src - lo).astype(np.float32)
    m[np.arange(n_out), lo] += 1.0 - w
    m[np.arange(n_out), hi] += w
    return m


def upsample_bilinear2x(x, scale: int = 2):
    """torch nn.UpsamplingBilinear2d(scale_factor=scale) on NHWC maps."""
    B, H, W, C = x.shape
    mh = jnp.asarray(_upsample_matrix(H, scale))
    mw = jnp.asarray(_upsample_matrix(W, scale))
    x = jnp.einsum("oh,bhwc->bowc", mh, x, precision="highest")
    return jnp.einsum("ow,bhwc->bhoc", mw, x, precision="highest")


class StdConv2d(nn.Module):
    """Weight-standardised conv (vit_seg_modeling_resnet_skip.py:18-25)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        w = self.param("weight", _kaiming_conv, (k, k, cin, self.features))
        mean = w.mean(axis=(0, 1, 2), keepdims=True)
        var = w.var(axis=(0, 1, 2), keepdims=True)
        w = (w - mean) / jnp.sqrt(var + 1e-5)
        pad = k // 2
        y = jax.lax.conv_general_dilated(
            x, w, (self.stride, self.stride),
            ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,))
        return y


class PreActBottleneck(nn.Module):
    cout: int
    cmid: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        residual = x
        if self.stride != 1 or cin != self.cout:
            residual = StdConv2d(self.cout, 1, self.stride,
                                 name="downsample")(x)
            residual = GroupNorm(num_groups=self.cout, name="gn_proj")(
                residual)
        y = nn.relu(GroupNorm(num_groups=32, eps=1e-6, name="gn1")(
            StdConv2d(self.cmid, 1, name="conv1")(x)))
        y = nn.relu(GroupNorm(num_groups=32, eps=1e-6, name="gn2")(
            StdConv2d(self.cmid, 3, self.stride, name="conv2")(y)))
        y = GroupNorm(num_groups=32, eps=1e-6, name="gn3")(
            StdConv2d(self.cout, 1, name="conv3")(y))
        return nn.relu(residual + y)


class ResNetV2(nn.Module):
    """Pre-activation R50 stem; returns (/16 map, skips deepest-first)."""
    block_units: Sequence[int] = (3, 4, 9)
    width_factor: int = 1

    @nn.compact
    def __call__(self, x):
        width = int(64 * self.width_factor)
        x = StdConv2d(width, 7, 2, name="root_conv")(x)
        x = nn.relu(GroupNorm(num_groups=32, eps=1e-6, name="root_gn")(x))
        feats = [x]  # width @ /2
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        widths = (width * 4, width * 8, width * 16)
        mids = (width, width * 2, width * 4)
        in_size = feats[0].shape[1] * 2
        for b, (cout, cmid, n) in enumerate(
                zip(widths, mids, self.block_units)):
            for u in range(n):
                x = PreActBottleneck(
                    cout, cmid, stride=2 if (u == 0 and b > 0) else 1,
                    name=f"block{b + 1}_unit{u + 1}")(x)
            if b < 2:
                # zero-pad to the exact /4, /8 grid (maxpool VALID loses
                # a row/col: resnet_skip.py:146-155)
                right = in_size // 4 // (b + 1)
                if x.shape[1] != right:
                    pad = right - x.shape[1]
                    feats.append(jnp.pad(
                        x, ((0, 0), (0, pad), (0, pad), (0, 0))))
                else:
                    feats.append(x)
        return x, feats[::-1]


class ViTAttention(nn.Module):
    """MHA + TransNorm spatial stream (vit_seg_modeling.py:50-102)."""
    hidden: int
    heads: int

    @nn.compact
    def __call__(self, x):
        B, N, _ = x.shape
        h = self.heads
        hd = self.hidden // h

        def split(t):
            return t.reshape(B, N, h, hd).transpose(0, 2, 1, 3)

        q = split(Linear(self.hidden, name="query")(x))
        k = split(Linear(self.hidden, name="key")(x))
        v = split(Linear(self.hidden, name="value")(x))
        s = split(Linear(self.hidden, name="spatial")(x))
        probs = nn.softmax(
            jnp.einsum("bhqc,bhkc->bhqk", q, k) / math.sqrt(hd), axis=-1)
        ctx = jnp.einsum("bhqk,bhkc->bhqc", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, N, self.hidden)
        spatial = jnp.einsum("bhqk,bhkc->bhqc", probs, s)
        spatial = spatial.transpose(0, 2, 1, 3).reshape(B, N, self.hidden)
        return Linear(self.hidden, name="out")(ctx), spatial


class ViTBlock(nn.Module):
    hidden: int
    heads: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x):
        a, spatial = ViTAttention(self.hidden, self.heads, name="attn")(
            LayerNorm(eps=1e-6, name="attention_norm")(x))
        x = x + a
        hgt = LayerNorm(eps=1e-6, name="ffn_norm")(x)
        hgt = Linear(self.mlp_dim, name="fc1")(hgt)
        hgt = Linear(self.hidden, name="fc2")(gelu(hgt))
        return x + hgt, spatial


class Conv2dReLU(nn.Module):
    features: int
    kernel_size: int = 3
    use_running_average: bool = True

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.features, self.kernel_size,
                   padding="same" if self.kernel_size > 1 else "valid",
                   use_bias=False, name="conv")(x)
        x = BatchNorm(use_running_average=self.use_running_average,
                      name="bn")(x)
        return nn.relu(x)


class ChannelAttentionGate(nn.Module):
    """avg+max pooled bottleneck MLP gate (vit_seg_modeling.py:333-349)."""
    ratio: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mid = max(c // self.ratio, 1)
        avg = x.mean(axis=(1, 2), keepdims=True)
        mx = x.max(axis=(1, 2), keepdims=True)
        fc1 = Conv2d(mid, 1, use_bias=False, name="fc1")
        fc2 = Conv2d(c, 1, use_bias=False, name="fc2")
        gate = fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx)))
        return nn.sigmoid(gate) * x


class DecoderBlock(nn.Module):
    features: int
    use_running_average: bool = True

    @nn.compact
    def __call__(self, x, skip=None, att=None):
        x = upsample_bilinear2x(x)
        att = Conv2dReLU(self.features,
                         use_running_average=self.use_running_average,
                         name="convatt")(upsample_bilinear2x(att))
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        x = ChannelAttentionGate(name="chatt")(x)
        x = Conv2dReLU(self.features,
                       use_running_average=self.use_running_average,
                       name="conv1")(x)
        x = Conv2dReLU(self.features,
                       use_running_average=self.use_running_average,
                       name="conv2")(x)
        return x * att, att


class TransUNet(nn.Module):
    """R50-ViT-B/16 TransUNet with TransNorm attention-gated decoder.

    Input (B,H,W,1|3) -> sigmoid probabilities (B,H,W,num_classes)
    (the reference applies sigmoid in forward, :435 — binary skin
    checkpoints depend on it; set apply_sigmoid=False for logits)."""
    num_classes: int = 1
    img_size: int = 224
    hidden: int = 768
    num_layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    decoder_channels: Sequence[int] = (256, 128, 64, 16)
    n_skip: int = 3
    block_units: Sequence[int] = (3, 4, 9)
    width_factor: int = 1
    apply_sigmoid: bool = True
    use_running_average: bool = True

    @nn.compact
    def __call__(self, x):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        feat, skips = ResNetV2(self.block_units, self.width_factor,
                               name="hybrid_model")(x)
        # patch embed: 1x1 conv stride 1 on the /16 map (grid == map size)
        h16 = feat.shape[1]
        t = Conv2d(self.hidden, 1, name="patch_embeddings")(feat)
        B = t.shape[0]
        t = t.reshape(B, h16 * h16, self.hidden)
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (1, h16 * h16, self.hidden))
        t = t + pos
        for i in range(self.num_layers):
            t, spatial = ViTBlock(self.hidden, self.heads, self.mlp_dim,
                                  name=f"block{i}")(t)
        t = LayerNorm(eps=1e-6, name="encoder_norm")(t)

        ura = self.use_running_average
        xm = Conv2dReLU(512, use_running_average=ura, name="conv_more")(
            t.reshape(B, h16, h16, self.hidden))
        xa = Conv2dReLU(512, use_running_average=ura, name="conv_att")(
            spatial.reshape(B, h16, h16, self.hidden))
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < self.n_skip else None
            xm, xa = DecoderBlock(ch, use_running_average=ura,
                                  name=f"decoder{i}")(xm, skip=skip, att=xa)
        out = Conv2d(self.num_classes, 3, padding="same",
                     name="segmentation_head")(xm)
        return nn.sigmoid(out) if self.apply_sigmoid else out
