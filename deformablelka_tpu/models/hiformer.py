"""HiFormer — CNN + Swin pyramid with CrossViT-style dual-level fusion.

Parity targets (re-derived):
  /root/reference/2D/skin_code/model/hiformer/HiFormer.py
    HiFormer (:8-50): All2Cross -> drop CLS -> reshape branches to maps
    (56x56x96 and 14x14x384) -> ConvUpsample towers (:16-17) -> sum ->
    1x1 conv to 16ch + ReLU + x4 bilinear (align_corners=False) ->
    3x3 seg head.
  /root/reference/2D/skin_code/model/hiformer/Encoder.py
    PyramidFeatures (:113-190): torchvision resnet34 children[:7]
    (conv/bn/relu/maxpool/layer1..3) interleaved with Swin-tiny stages —
    level fusion by addition (fm_i 1x1-projected to the swin width plus
    the swin stream), PatchMerging between levels; CLS tokens made by
    token-mean (AdaptiveAvgPool1d) of LayerNormed level-1/level-3 maps.
    All2Cross (:193-252): per-branch learned pos-embed (cross_pos_embed),
    MultiScaleBlock stack (config.depth [[1,1,0]] for HiFormer-S),
    final per-branch LayerNorm.
  /root/reference/2D/skin_code/model/hiformer/utils.py
    CrossAttention (:414-443): query = CLS token only, keys/values = all
    tokens; CrossAttentionBlock (:445-466, has_mlp=False in fusion)
    returns just the fused CLS token. MultiScaleBlock (:469-548):
    project each branch's CLS into the other branch, fuse, revert-
    project, re-attach to own patch tokens, then per-branch ViT blocks.
    NOTE the reference forward returns `outs` (pre-block) — its branch
    ViT blocks are dead code; we apply them (`outs_b`), matching the
    published HiFormer (arXiv 2207.08518) and the upstream repo.

Swin pieces (window attention, shifted windows, PatchMerging) are
reused from models/swinunet.py.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from deformablelka_tpu.nn.layers import Conv2d, Linear, gelu
from deformablelka_tpu.nn.norms import LayerNorm, GroupNorm, BatchNorm
from deformablelka_tpu.models.swinunet import SwinBlock, PatchMerging


# ---------------------------------------------------------------- resnet34


class BasicBlock(nn.Module):
    """torchvision resnet BasicBlock (3x3-bn-relu-3x3-bn + skip)."""
    features: int
    stride: int = 1
    use_running_average: bool = True

    @nn.compact
    def __call__(self, x):
        ura = self.use_running_average
        identity = x
        h = Conv2d(self.features, 3, stride=self.stride, padding="same"
                   if self.stride == 1 else ((1, 1), (1, 1)),
                   use_bias=False, name="conv1")(x)
        h = nn.relu(BatchNorm(use_running_average=ura, name="bn1")(h))
        h = Conv2d(self.features, 3, padding="same", use_bias=False,
                   name="conv2")(h)
        h = BatchNorm(use_running_average=ura, name="bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = Conv2d(self.features, 1, stride=self.stride,
                              use_bias=False, name="down_conv")(x)
            identity = BatchNorm(use_running_average=ura,
                                 name="down_bn")(identity)
        return nn.relu(h + identity)


class ResNetLayer(nn.Module):
    features: int
    blocks: int
    stride: int = 1
    use_running_average: bool = True

    @nn.compact
    def __call__(self, x):
        for i in range(self.blocks):
            x = BasicBlock(self.features, self.stride if i == 0 else 1,
                           self.use_running_average, name=f"block{i}")(x)
        return x


# ----------------------------------------------------------- CrossViT DLF


class ViTBlock(nn.Module):
    """timm vision_transformer.Block (pre-norm MHA + MLP)."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        h = self.num_heads
        hd = C // h
        n = LayerNorm(name="norm1")(x)
        qkv = Linear(3 * C, use_bias=self.qkv_bias, name="qkv")(n)
        q, k, v = qkv.reshape(B, N, 3, h, hd).transpose(2, 0, 3, 1, 4)
        attn = nn.softmax(
            jnp.einsum("bhqc,bhkc->bhqk", q, k) * hd ** -0.5, axis=-1)
        o = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
        x = x + Linear(C, name="proj")(o)
        n2 = LayerNorm(name="norm2")(x)
        m = Linear(int(C * self.mlp_ratio), name="fc1")(n2)
        m = Linear(C, name="fc2")(gelu(m))
        return x + m


class CrossAttentionBlock(nn.Module):
    """CLS-query cross attention (utils.py:414-466); returns (B,1,C)."""
    dim: int
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        h = self.num_heads
        hd = C // h
        n = LayerNorm(name="norm1")(x)
        q = Linear(C, use_bias=self.qkv_bias, name="wq")(n[:, :1])
        k = Linear(C, use_bias=self.qkv_bias, name="wk")(n)
        v = Linear(C, use_bias=self.qkv_bias, name="wv")(n)
        q = q.reshape(B, 1, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, h, hd).transpose(0, 2, 1, 3)
        attn = nn.softmax(
            jnp.einsum("bhqc,bhkc->bhqk", q, k) * hd ** -0.5, axis=-1)
        o = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, 1, C)
        return x[:, :1] + Linear(C, name="proj")(o)


class MultiScaleBlock(nn.Module):
    """CrossViT dual-branch fusion (utils.py:469-548).

    reference_exact=True reproduces the reference FILE exactly, which
    at the shipped configs (depth [[1,1,0]] / [[1,2,0]]) has TWO dead
    paths: the fusion list is built `for _ in range(depth[-1])` =
    range(0) (utils.py:509-513, no cross attention at all), and the
    forward computes `outs_b = [block(x_) ...]` but returns `outs`
    (:538-539, branch ViT blocks dead). The default False matches the
    published HiFormer (arXiv 2207.08518): one fusion block per branch
    and live branch blocks; the golden test pins reference behavior."""
    dims: Sequence[int] = (96, 384)
    depth: Sequence[int] = (1, 1, 0)
    num_heads: Sequence[int] = (3, 3)
    mlp_ratio: Sequence[float] = (1.0, 1.0, 1.0)
    reference_exact: bool = False

    @nn.compact
    def __call__(self, xs):
        nb = len(self.dims)
        # project each branch's CLS token into the other branch's width
        cls = []
        for d in range(nb):
            t = LayerNorm(name=f"proj{d}_norm")(xs[d][:, :1])
            t = Linear(self.dims[(d + 1) % nb],
                       name=f"proj{d}_linear")(gelu(t))
            cls.append(t)
        outs = []
        for d in range(nb):
            other = (d + 1) % nb
            n_fuse = (self.depth[-1] if self.reference_exact
                      else max(self.depth[-1], 1))
            tmp = jnp.concatenate([cls[d], xs[other][:, 1:]], axis=1)
            for j in range(n_fuse):
                tmp = CrossAttentionBlock(
                    self.dims[other], self.num_heads[other],
                    name=f"fusion{d}_{j}")(tmp)
            r = LayerNorm(name=f"revert{d}_norm")(tmp[:, :1])
            r = Linear(self.dims[d], name=f"revert{d}_linear")(gelu(r))
            out = jnp.concatenate([r, xs[d][:, 1:]], axis=1)
            if not self.reference_exact:
                for j in range(self.depth[d]):
                    out = ViTBlock(self.dims[d], self.num_heads[d],
                                   self.mlp_ratio[d],
                                   name=f"block{d}_{j}")(out)
            outs.append(out)
        return outs


# ------------------------------------------------------------- the model


class PyramidFeatures(nn.Module):
    """ResNet34 + Swin-tiny additive pyramid (Encoder.py:113-190)."""
    img_size: int = 224
    swin_dims: Sequence[int] = (96, 192, 384)
    cnn_dims: Sequence[int] = (64, 128, 256)
    cnn_blocks: Sequence[int] = (3, 4, 6)
    swin_depths: Sequence[int] = (2, 2, 6)
    swin_heads: Sequence[int] = (3, 6, 12)
    window_size: int = 7
    use_running_average: bool = True

    def _swin_stage(self, t, H, W, stage):
        for i in range(self.swin_depths[stage]):
            t = SwinBlock(self.swin_dims[stage], self.swin_heads[stage],
                          window_size=self.window_size,
                          shift_size=0 if i % 2 == 0 else
                          self.window_size // 2,
                          name=f"swin{stage}_{i}")(t, H, W)
        return t

    @nn.compact
    def __call__(self, x):
        ura = self.use_running_average
        s1, s2, s3 = self.swin_dims
        # resnet34 root + layer1 (children [0:5])
        h = Conv2d(64, 7, stride=2, padding=((3, 3), (3, 3)),
                   use_bias=False, name="root_conv")(x)
        h = nn.relu(BatchNorm(use_running_average=ura, name="root_bn")(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        fm1 = ResNetLayer(self.cnn_dims[0], self.cnn_blocks[0],
                          use_running_average=ura, name="layer1")(h)

        H1 = self.img_size // 4
        # level 1
        t = Conv2d(s1, 1, name="p1_ch")(fm1).reshape(
            fm1.shape[0], H1 * H1, s1)
        sw1 = self._swin_stage(t, H1, H1, 0)
        sw1_skipped = t + sw1
        norm1 = LayerNorm(name="norm_1")(sw1_skipped)
        cls1 = norm1.mean(axis=1, keepdims=True)
        t = PatchMerging(s1, name="p1_pm")(sw1_skipped, H1, H1)

        # level 2
        H2 = H1 // 2
        t = self._swin_stage(t, H2, H2, 1)
        fm2 = ResNetLayer(self.cnn_dims[1], self.cnn_blocks[1], stride=2,
                          use_running_average=ura, name="layer2")(fm1)
        t = t + Conv2d(s2, 1, name="p2_ch")(fm2).reshape(
            fm2.shape[0], H2 * H2, s2)
        t = PatchMerging(s2, name="p2_pm")(t, H2, H2)

        # level 3
        H3 = H2 // 2
        t = self._swin_stage(t, H3, H3, 2)
        fm3 = ResNetLayer(self.cnn_dims[2], self.cnn_blocks[2], stride=2,
                          use_running_average=ura, name="layer3")(fm2)
        t = t + Conv2d(s3, 1, name="p3_ch")(fm3).reshape(
            fm3.shape[0], H3 * H3, s3)
        norm2 = LayerNorm(name="norm_2")(t)
        cls3 = norm2.mean(axis=1, keepdims=True)

        return [jnp.concatenate([cls1, sw1_skipped], axis=1),
                jnp.concatenate([cls3, t], axis=1)]


class ConvUpsample(nn.Module):
    out_chans: Sequence[int] = (128,)
    upsample: bool = True

    @nn.compact
    def __call__(self, x):
        for i, c in enumerate(self.out_chans):
            x = Conv2d(c, 3, padding="same", use_bias=False,
                       name=f"conv{i}")(x)
            x = nn.relu(GroupNorm(num_groups=32, name=f"gn{i}")(x))
            if self.upsample:
                B, H, W, C = x.shape
                x = jax.image.resize(x, (B, 2 * H, 2 * W, C), "bilinear")
        return x


class HiFormer(nn.Module):
    """HiFormer-S by default. Input (B,H,W,1|3) -> logits
    (B,H,W,num_classes)."""
    num_classes: int = 9
    img_size: int = 224
    swin_dims: Sequence[int] = (96, 192, 384)
    cnn_dims: Sequence[int] = (64, 128, 256)
    cnn_blocks: Sequence[int] = (3, 4, 6)
    swin_depths: Sequence[int] = (2, 2, 6)
    swin_heads: Sequence[int] = (3, 6, 12)
    dlf_depth: Sequence[int] = (1, 1, 0)
    dlf_heads: Sequence[int] = (3, 3)
    dlf_mlp_ratio: Sequence[float] = (1.0, 1.0, 1.0)
    n_dlf_blocks: int = 1
    reference_exact: bool = False  # see MultiScaleBlock
    use_running_average: bool = True

    @nn.compact
    def __call__(self, x):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        B = x.shape[0]
        dims = (self.swin_dims[0], self.swin_dims[2])
        xs = PyramidFeatures(
            img_size=self.img_size, swin_dims=self.swin_dims,
            cnn_dims=self.cnn_dims, cnn_blocks=self.cnn_blocks,
            swin_depths=self.swin_depths, swin_heads=self.swin_heads,
            use_running_average=self.use_running_average,
            name="pyramid")(x)
        n1 = (self.img_size // 4) ** 2
        n2 = (self.img_size // 16) ** 2
        for i, (n, d) in enumerate(zip((n1, n2), dims)):
            pos = self.param(f"pos_embed_{i}",
                             nn.initializers.normal(0.02), (1, 1 + n, d))
            xs[i] = xs[i] + pos
        for b in range(self.n_dlf_blocks):
            xs = MultiScaleBlock(dims, self.dlf_depth, self.dlf_heads,
                                 self.dlf_mlp_ratio,
                                 self.reference_exact,
                                 name=f"dlf{b}")(xs)
        xs = [LayerNorm(name=f"norm{i}")(t) for i, t in enumerate(xs)]

        H1 = self.img_size // 4
        H3 = self.img_size // 16
        e_l = xs[0][:, 1:].reshape(B, H1, H1, dims[0])
        e_s = xs[1][:, 1:].reshape(B, H3, H3, dims[1])
        e_l = ConvUpsample(out_chans=(128,), upsample=False,
                           name="convup_l")(e_l)
        e_s = ConvUpsample(out_chans=(128, 128), upsample=True,
                           name="convup_s")(e_s)
        c = e_l + e_s
        c = nn.relu(Conv2d(16, 1, name="conv_pred")(c))
        c = jax.image.resize(
            c, (B, self.img_size, self.img_size, 16), "bilinear")
        return Conv2d(self.num_classes, 3, padding="same",
                      name="segmentation_head")(c)
