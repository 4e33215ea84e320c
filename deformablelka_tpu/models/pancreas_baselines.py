"""Pancreas baseline networks: VNet, ResNet34 seg net, UNETR.

Reference behaviour (re-derived):
  /root/reference/3D/pancreas_code/networks/vnet.py:5-246 — VNet:
    additive-skip encoder/decoder, 5 levels, ConvBlock(n_stages ×
    [3³ conv + norm + ReLU]), strided-conv downsample, deconv upsample,
    filters 16·2^level, 1×1×1 head, optional dropout 0.5 at the
    bottleneck and before the head.
  /root/reference/3D/pancreas_code/networks/ResNet34.py:184-248 —
    Resnet34: a 3D resnet34 encoder (resnet.py:99-223; conv7³ s1 stem,
    BasicBlock stages [3,4,6,3] each stride 2, widths 16·2^l, zero-init
    bn2 gamma) + a VNet-style additive-skip deconv decoder built from
    the SAME ConvBlock/UpsamplingDeconvBlock family with the
    constructor-default normalization='none' (deconv+ReLU, conv+ReLU).
    NOTE the reference forward ignores its n_channels arg (the encoder
    is always resnet34() with in_channel=1) and never calls maxpool/
    avgpool; we reproduce the live path.
  /root/reference/3D/pancreas_code/networks/unetr.py:22-230 — UNETR
    (the MONAI 0.7 class): ViT-768/12 encoder (16³ perceptron patch
    embedding, taps after blocks 4/7/10), UnetrPrUpBlock deconv chains
    for the skips, UnetrUpBlock (deconv + concat + UnetResBlock)
    decoder, 1×1 head. monai is not installed in this image, so the
    harness executes the reference file under a MONAI-0.7 shim (the
    vendored dynunet_block + a name-faithful ViT re-typing) — golden
    parity in test_golden_3d.py::test_golden_unetr_parity, like
    VNet/Resnet34.

All channels-last (B, D, H, W, C) flax modules.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from deformablelka_tpu.nn.dynunet import UnetOutBlock, UnetResBlock
from deformablelka_tpu.nn.layers import Conv3d, ConvTranspose, Linear
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


class BasicBlock3d(nn.Module):
    """3D torchvision-style BasicBlock (resnet.py:23-55): conv3³(s) →
    bn → relu → conv3³ → bn(zero-gamma) [+ 1×1(s)+bn shortcut] → relu.
    Torch-style explicit padding=1 (flax SAME pads (0,1) at stride 2 on
    even extents — different output)."""
    planes: int
    stride: int = 1
    train: bool = False

    @nn.compact
    def __call__(self, x):
        def bn(name, zero_gamma=False):
            return BatchNorm(name=name, use_running_average=not self.train,
                             scale_init=(nn.initializers.zeros if zero_gamma
                                         else nn.initializers.ones))

        out = Conv3d(self.planes, 3, stride=self.stride, padding=1,
                     use_bias=False, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = Conv3d(self.planes, 3, padding=1, use_bias=False,
                     name="conv2")(out)
        out = bn("bn2", zero_gamma=True)(out)
        residual = x
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = Conv3d(self.planes, 1, stride=self.stride, padding=0,
                              use_bias=False, name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(out + residual)


class ResNet34Encoder3d(nn.Module):
    """resnet34() 3D encoder (resnet.py:99-223, width=1 → base 16):
    conv7³ s1 p3 stem + 4 BasicBlock stages [3,4,6,3], every stage's
    first block stride 2. Returns the 5 feature maps the Resnet34
    forward uses (resnet.py:199-211); maxpool/avgpool are dead code
    there and are not built."""
    width: int = 1
    depths: Sequence[int] = (3, 4, 6, 3)
    train: bool = False

    @nn.compact
    def __call__(self, x):
        base = 16 * self.width
        h = Conv3d(base, 7, stride=1, padding=3, use_bias=False,
                   name="conv1")(x)
        h = nn.relu(BatchNorm(name="bn1",
                              use_running_average=not self.train)(h))
        feats = [h]
        for li, n_blocks in enumerate(self.depths):
            planes = base * (2 ** (li + 1))
            for bi in range(n_blocks):
                h = BasicBlock3d(planes, stride=2 if bi == 0 else 1,
                                 train=self.train,
                                 name=f"layer{li + 1}_{bi}")(h)
            feats.append(h)
        return feats


class Resnet34Seg(nn.Module):
    """The pancreas Resnet34 baseline (ResNet34.py:184-240): resnet34
    3D encoder + additive-skip deconv decoder with the constructor
    default normalization='none'. Dropout (p=0.5, before out_conv) only
    with has_dropout=True, mirroring the reference flag."""
    n_classes: int = 2
    n_filters: int = 16
    normalization: str = "none"
    has_dropout: bool = False
    train: bool = False
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        nf, nm = self.n_filters, self.normalization
        x0, c2, c3, c4, c5 = ResNet34Encoder3d(
            train=self.train, name="resnet_encoder")(x)
        u5 = UpBlock(nf * 8, 2, nm, name="block_five_up")(c5) + c4
        x6 = ConvBlock(3, nf * 8, nm, name="block_six")(u5)
        u6 = UpBlock(nf * 4, 2, nm, name="block_six_up")(x6) + c3
        x7 = ConvBlock(3, nf * 4, nm, name="block_seven")(u6)
        u7 = UpBlock(nf * 2, 2, nm, name="block_seven_up")(x7) + c2
        x8 = ConvBlock(2, nf * 2, nm, name="block_eight")(u7)
        u8 = UpBlock(nf, 2, nm, name="block_eight_up")(x8) + x0
        x9 = ConvBlock(1, nf, nm, name="block_nine")(u8)
        if self.has_dropout:
            x9 = nn.Dropout(0.5, deterministic=self.deterministic)(x9)
        return nn.Conv(self.n_classes, (1, 1, 1), name="out_conv")(x9)


# ---------------------------------------------------------------------------
# UNETR (unetr.py:22-230 / MONAI 0.7). Golden-tested vs the reference's
# own unetr.py executed under the MONAI-0.7 shim
# (tests/test_golden_3d.py::test_golden_unetr_parity).
# ---------------------------------------------------------------------------

class _SABlock(nn.Module):
    """MONAI SABlock: fused qkv Linear (no bias), per-head scaled
    dot-product, output Linear."""
    hidden: int
    heads: int

    @nn.compact
    def __call__(self, x):
        B, N, _ = x.shape
        hd = self.hidden // self.heads
        qkv = Linear(self.hidden * 3, use_bias=False, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.heads, hd)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        a = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (hd ** -0.5)
        a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = jnp.einsum("bhnm,bhmd->bhnd", a, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, self.hidden)
        return Linear(self.hidden, name="out_proj")(o)


class _ViTBlock(nn.Module):
    """MONAI TransformerBlock: pre-norm MHSA + pre-norm MLP (GELU)."""
    hidden: int
    mlp_dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x + _SABlock(self.hidden, self.heads, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h = Linear(self.mlp_dim, name="mlp_fc1")(h)
        h = Linear(self.hidden, name="mlp_fc2")(nn.gelu(h))
        return x + h


class _PrUpBlock(nn.Module):
    """UnetrPrUpBlock, conv_block=False (the reference's default):
    deconv(in→out, k2 s2) then num_layer × deconv(out→out, k2 s2)."""
    out_channels: int
    num_layer: int

    @nn.compact
    def __call__(self, x):
        x = ConvTranspose(self.out_channels, 2, stride=2, use_bias=False,
                          name="transp_conv_init")(x)
        for i in range(self.num_layer):
            x = ConvTranspose(self.out_channels, 2, stride=2,
                              use_bias=False, name=f"blocks_{i}")(x)
        return x


class _UnetrUpBlock(nn.Module):
    """UnetrUpBlock, res_block=True: deconv(in→out, k2 s2), concat
    skip, UnetResBlock(2·out→out, 3³, instance)."""
    out_channels: int
    norm_name: str = "instance"

    @nn.compact
    def __call__(self, x, skip):
        x = ConvTranspose(self.out_channels, 2, stride=2, use_bias=False,
                          name="transp_conv")(x)
        x = jnp.concatenate([x, skip], axis=-1)
        return UnetResBlock(3, self.out_channels, 3, 1, self.norm_name,
                            name="conv_block")(x)


class UNETR(nn.Module):
    """UNETR (unetr.py:22-230): ViT-hidden/12 with 16³ perceptron patch
    embedding; skips from the raw input (UnetrBasicBlock) and from the
    token maps after blocks 4/7/10 (hidden_states_out[3/6/9],
    unetr.py:216-223) upsampled by deconv chains; UnetrUpBlock decoder;
    1×1 head."""
    n_classes: int = 2
    in_channels: int = 1
    img_size: Sequence[int] = (96, 96, 96)
    feature_size: int = 16
    hidden: int = 768
    mlp_dim: int = 3072
    heads: int = 12
    depth: int = 12
    patch_size: int = 16
    norm_name: str = "instance"

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        p = self.patch_size
        g = [s // p for s in self.img_size]
        n_patches = g[0] * g[1] * g[2]

        # perceptron patch embedding: rearrange to (p1 p2 p3 c) vectors
        # then Linear (MONAI PatchEmbeddingBlock, pos_embed="perceptron")
        t = x.reshape(B, g[0], p, g[1], p, g[2], p, self.in_channels)
        t = t.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            B, n_patches, p ** 3 * self.in_channels)
        t = Linear(self.hidden, name="patch_embed")(t)
        pos = self.param("position_embeddings",
                         nn.initializers.truncated_normal(0.02),
                         (1, n_patches, self.hidden))
        t = t + pos

        taps = {}
        for i in range(self.depth):
            t = _ViTBlock(self.hidden, self.mlp_dim, self.heads,
                          name=f"vit_block_{i}")(t)
            if i in (3, 6, 9):
                taps[i] = t
        t = nn.LayerNorm(epsilon=1e-5, name="vit_norm")(t)

        def proj(tok):
            return tok.reshape(B, g[0], g[1], g[2], self.hidden)

        fs = self.feature_size
        enc1 = UnetResBlock(3, fs, 3, 1, self.norm_name,
                            name="encoder1")(x)
        enc2 = _PrUpBlock(fs * 2, 2, name="encoder2")(proj(taps[3]))
        enc3 = _PrUpBlock(fs * 4, 1, name="encoder3")(proj(taps[6]))
        enc4 = _PrUpBlock(fs * 8, 0, name="encoder4")(proj(taps[9]))
        d4 = proj(t)
        d3 = _UnetrUpBlock(fs * 8, self.norm_name, name="decoder5")(d4, enc4)
        d2 = _UnetrUpBlock(fs * 4, self.norm_name, name="decoder4")(d3, enc3)
        d1 = _UnetrUpBlock(fs * 2, self.norm_name, name="decoder3")(d2, enc2)
        out = _UnetrUpBlock(fs, self.norm_name, name="decoder2")(d1, enc1)
        return UnetOutBlock(3, self.n_classes, name="out")(out)
