"""2D LKA / deformable-LKA attention modules (flax.linen, channels-last).

Reference parity targets (re-derived from module behaviour):
  /root/reference/2D/deformable_LKA/LKA.py:4-37          — LKA, LKA_Attention
  /root/reference/2D/deformable_LKA/deformable_LKA.py:5-158
      DeformConv (offset_net same-kernel conv + torchvision DeformConv2d,
      depthwise, no bias), deformable_LKA (5×5 then 7×7 dil-3), and
      deformable_LKA_Attention (1×1 → GELU → gate → 1×1 + residual).
  /root/reference/2D/networks/MaxViT_deform_LKA.py:20-189
      DWConvLKA, Mlp, AttentionModule, SpatialAttention, LKABlock,
      deformableLKABlock (pre-norm, layer-scale 1e-2, DropPath).

All modules keep torch attribute names so torch→JAX key mapping is 1:1.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from deformablelka_tpu.nn.layers import Conv2d, DropPath, Linear, gelu
from deformablelka_tpu.nn.norms import LayerNorm
from deformablelka_tpu.ops import deform_conv2d
from deformablelka_tpu.ops.convs import _tuple, same_padding


class DeformConv(nn.Module):
    """Offset-predicting conv + depthwise deformable conv.

    Mirrors deformable_LKA.py:5-30: `offset_net` is a conv with the SAME
    kernel/padding/dilation as the deformable conv, predicting 2K offsets;
    the deformable conv itself is bias-free with `groups` groups.
    """
    kernel_size: tuple = (3, 3)
    padding: int = 1
    stride: int = 1
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        kh, kw = _tuple(self.kernel_size, 2)
        K = kh * kw
        offsets = Conv2d(2 * K, (kh, kw), stride=self.stride,
                         padding=self.padding, dilation=self.dilation,
                         use_bias=True, name="offset_net")(x)
        cin = x.shape[-1]
        w = self.param(
            "deform_conv_weight",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (kh, kw, cin // self.groups, cin))
        return deform_conv2d(x, offsets, w, None, stride=self.stride,
                             padding=self.padding, dilation=self.dilation,
                             groups=self.groups)


class deformable_LKA(nn.Module):
    """Deformable large-kernel decomposition with multiplicative gate."""

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        u = x
        attn = DeformConv(kernel_size=(5, 5), padding=2, groups=dim,
                          name="conv0")(x)
        attn = DeformConv(kernel_size=(7, 7), padding=9, dilation=3,
                          groups=dim, name="conv_spatial")(attn)
        attn = Conv2d(dim, 1, name="conv1")(attn)
        return u * attn


class deformable_LKA_Attention(nn.Module):
    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        shortcut = x
        x = Conv2d(dim, 1, name="proj_1")(x)
        x = gelu(x)
        x = deformable_LKA(name="spatial_gating_unit")(x)
        x = Conv2d(dim, 1, name="proj_2")(x)
        return x + shortcut


def _dw_pair2d(x, dim):
    """The 2D LKA chain's two depthwise convs; with DLKA_LKA_IMPL=fused
    both run in one Pallas kernel (see blocks3d._dw_pair3d)."""
    from deformablelka_tpu.ops.lka import lka_impl
    if lka_impl() == "fused":
        from deformablelka_tpu.ops.pallas.lka_fused_kernel import (
            dw_chain2d_fused, lka2d_fused_supported)
        if lka2d_fused_supported(*x.shape[1:3]):
            w0, b0 = Conv2d(dim, 5, padding=2, groups=dim, name="conv0",
                            as_params=True)(x)
            ws, bs = Conv2d(dim, 7, padding=9, dilation=3, groups=dim,
                            name="conv_spatial", as_params=True)(x)
            return dw_chain2d_fused(x, w0, b0, ws, bs)
    attn = Conv2d(dim, 5, padding=2, groups=dim, name="conv0")(x)
    return Conv2d(dim, 7, padding=9, dilation=3, groups=dim,
                  name="conv_spatial")(attn)


class AttentionModule(nn.Module):
    """Plain (non-deformable) LKA gate — LKA.py:4-18."""

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        u = x
        attn = _dw_pair2d(x, dim)
        attn = Conv2d(dim, 1, name="conv1")(attn)
        return u * attn


class SpatialAttention(nn.Module):
    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        shortcut = x
        x = Conv2d(dim, 1, name="proj_1")(x)
        x = gelu(x)
        x = AttentionModule(name="spatial_gating_unit")(x)
        x = Conv2d(dim, 1, name="proj_2")(x)
        return x + shortcut


class DWConvLKA(nn.Module):
    """3×3 depthwise conv (MaxViT_deform_LKA.py:20-27)."""

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        return Conv2d(dim, 3, padding=1, groups=dim, name="dwconv")(x)


class Mlp(nn.Module):
    """1×1 conv → dw3×3 → GELU → 1×1 conv (MaxViT_deform_LKA.py:29-52)."""
    hidden_features: int
    out_features: int | None = None
    drop: float = 0.0
    linear: bool = False
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        out_features = self.out_features or x.shape[-1]
        x = Conv2d(self.hidden_features, 1, name="fc1")(x)
        if self.linear:
            x = nn.relu(x)
        x = DWConvLKA(name="dwconv")(x)
        x = gelu(x)
        x = nn.Dropout(self.drop, deterministic=self.deterministic)(x)
        x = Conv2d(out_features, 1, name="fc2")(x)
        x = nn.Dropout(self.drop, deterministic=self.deterministic)(x)
        return x


class _LKABlockBase(nn.Module):
    """Shared skeleton of LKABlock / deformableLKABlock
    (MaxViT_deform_LKA.py:90-189): pre-norm, attention, layer-scale 1e-2,
    DropPath, then pre-norm MLP with layer-scale. Channels-last
    (B, H, W, C) in/out."""
    mlp_ratio: float = 4.0
    drop: float = 0.0
    drop_path: float = 0.0
    deformable: bool = True
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        init_ls = nn.initializers.constant(1e-2)
        ls1 = self.param("layer_scale_1", init_ls, (dim,))
        ls2 = self.param("layer_scale_2", init_ls, (dim,))
        dp = DropPath(self.drop_path, deterministic=self.deterministic)

        y = LayerNorm(name="norm1")(x)
        if self.deformable:
            y = deformable_LKA_Attention(name="attn")(y)
        else:
            y = SpatialAttention(name="attn")(y)
        x = x + dp(ls1 * y)

        y = LayerNorm(name="norm2")(x)
        y = Mlp(hidden_features=int(dim * self.mlp_ratio), drop=self.drop,
                deterministic=self.deterministic, name="mlp")(y)
        x = x + dp(ls2 * y)
        return x


class deformableLKABlock(_LKABlockBase):
    deformable: bool = True


class LKABlock(_LKABlockBase):
    deformable: bool = False
