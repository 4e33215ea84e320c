"""3D transformer-block family (flax.linen, channels-last NDHWC).

Re-implements, TPU-first, the 12-variant block registry of
/root/reference/3D/d_lka_former/network_architecture/synapse/transformerblock.py:
  TransformerBlock (EPA, :6-65 / EPA :68-138)
  TransformerBlock_EA (:218-278, EfficientAttention :144-214)
  TransformerBlock_3D_LKA (:285-345, LKA3d :349-414)
  TransformerBlock_2Dsingle (:498-560, per-depth-slice 2D deformable LKA
      :423-496 — vectorised here by folding the slice axis into batch
      instead of the reference's python loop)
  TransformerBlock_3D_single_deform_LKA (:570-673, the published 3D block)
  TransformerBlock_3D_LKA_3D_conv (:682-792)
  TransformerBlock_LKA_Spatial (:794-977) / _LKA_Channel (:979-1149)
  TransformerBlock_LKA_Channel_norm (:1151-1324)
  TransformerBlock_SE (:1326-1465)
  TransformerBlock_Deform_LKA_Channel (:1467-1671) / _sequential (:1673-2079)
  TransformerBlock_Deform_LKA_Spatial (:2081-2278) / _sequential (:1872-2079)

Shared skeleton (:52-65): tokens = flatten(NDHWC); optional learned
pos-embed; x + gamma·attn(norm(x)); then UnetResBlock 3³ ("batch" norm) and
dropout+1×1 conv residual. Token order (s1, s2, s3) row-major matches the
reference's (B, C, H, W, D) flatten, so positional embeddings convert 1:1.

All dense math runs as einsums on the MXU; attention keeps fp32 softmax.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import flax.linen as nn

from deformablelka_tpu.nn.layers import Conv2d, Conv3d, Linear, gelu
from deformablelka_tpu.nn.norms import LayerNorm
from deformablelka_tpu.nn.dynunet import UnetResBlock
from deformablelka_tpu.ops import deform_conv2d, deform_conv3d


def _l2norm(x, axis=-1, eps=1e-12):
    """torch F.normalize semantics: x / max(||x||, eps)."""
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


def _softmax(x, axis=-1):
    return jax.nn.softmax(x.astype(jnp.float32), axis=axis).astype(x.dtype)


# ---------------------------------------------------------------------------
# Deformable conv modules
# ---------------------------------------------------------------------------

class DeformConvPack3d(nn.Module):
    """3D deformable conv with self-predicted offsets (DeformConvPack,
    deform_conv.py:67-105): `conv_offset` is a same-kernel conv with
    zero-initialised weight+bias (identity sampling at init); the deform
    conv has kaiming weight and bias. Offset channels: 3*K, (Δd,Δh,Δw)
    per tap, taps row-major."""
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        K = k ** 3
        dim = x.shape[-1]
        offsets = Conv3d(3 * K, k, stride=self.stride, padding=self.padding,
                         use_bias=True,
                         kernel_init=nn.initializers.zeros,
                         name="conv_offset")(x)
        w = self.param(
            "weight",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (k, k, k, dim, dim))
        b = self.param("bias", nn.initializers.zeros, (dim,)) \
            if self.use_bias else None
        return deform_conv3d(x, offsets, w, b, stride=self.stride,
                             padding=self.padding)


class DeformConv2dSlice(nn.Module):
    """2D deformable conv with 3×3 offset predictor — the variant embedded
    in the 3D file (transformerblock.py:423-448): offset_net is ALWAYS a
    3×3 pad-1 conv regardless of the deformable kernel."""
    kernel_size: tuple = (3, 3)
    padding: int = 1
    stride: int = 1
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        K = kh * kw
        offsets = Conv2d(2 * K, 3, padding=1, use_bias=True,
                         name="offset_net")(x)
        cin = x.shape[-1]
        w = self.param(
            "deform_conv_weight",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (kh, kw, cin // self.groups, cin))
        return deform_conv2d(x, offsets, w, None, stride=self.stride,
                             padding=self.padding, dilation=self.dilation,
                             groups=self.groups)


# ---------------------------------------------------------------------------
# Gating units (LKA3d family). All operate on (B, S1, S2, S3, C).
# ---------------------------------------------------------------------------

def _dw_pair3d(x, dim):
    """The LKA chain's two depthwise convs (dw5³ → dw7³-dil3). With
    DLKA_LKA_IMPL=fused (and a supported shape) both run in ONE Pallas
    kernel (ops/pallas/lka_fused_kernel) — the intermediate never
    leaves VMEM; param tree identical either way."""
    from deformablelka_tpu.ops.lka import lka_impl
    if lka_impl() == "fused":
        from deformablelka_tpu.ops.pallas.lka_fused_kernel import (
            dw_chain3d_fused, lka3d_fused_supported)
        if lka3d_fused_supported(*x.shape[1:4]):
            w0, b0 = Conv3d(dim, 5, padding=2, groups=dim, name="conv0",
                            as_params=True)(x)
            ws, bs = Conv3d(dim, 7, padding=9, dilation=3, groups=dim,
                            name="conv_spatial", as_params=True)(x)
            return dw_chain3d_fused(x, w0, b0, ws, bs)
    attn = Conv3d(dim, 5, padding=2, groups=dim, name="conv0")(x)
    return Conv3d(dim, 7, padding=9, dilation=3, groups=dim,
                  name="conv_spatial")(attn)


class LKA3d(nn.Module):
    """Plain 3D LKA gate: dw5³ → dw7³ dil3 → 1×1×1, multiply."""

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        u = x
        attn = _dw_pair3d(x, dim)
        attn = Conv3d(dim, 1, name="conv1")(attn)
        return u * attn


class LKA3dDeform(nn.Module):
    """Published 3D D-LKA gate: dw5³ → dw7³d3 → DeformConvPack 3³ → 1×1×1
    (transformerblock.py:634-652)."""

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        u = x
        attn = _dw_pair3d(x, dim)
        attn = DeformConvPack3d(name="deform_conv")(attn)
        attn = Conv3d(dim, 1, name="conv1")(attn)
        return u * attn


class LKA3dDeformACDC(nn.Module):
    """ACDC D-LKA gate (acdc/transformerblock.py:211-252): unlike the
    Synapse gate, the kernels are dim-dependent and ANISOTROPIC — the
    ACDC crop (16,160,160) is shallow in depth, so the dilated kernel
    shrinks along it:
      dim 32/64: dw5³ → dwd (5,7,7) dil 3 pad (6,9,9)
      dim 128:   dw5³ → dwd (3,5,5) dil (1,3,3) pad (1,6,6)
      dim 256:   dw3³ → dwd 3³ dil 1 pad 1
    then DeformConvPack 3³ → 1×1, multiplicative gate. Param names
    match the Synapse gate so the converter is shared."""

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        if dim in (32, 64):
            k_dw, p_dw = 5, 2
            k_dwd, dil, p_dwd = (5, 7, 7), (3, 3, 3), (6, 9, 9)
        elif dim == 128:
            k_dw, p_dw = 5, 2
            k_dwd, dil, p_dwd = (3, 5, 5), (1, 3, 3), (1, 6, 6)
        elif dim == 256:
            k_dw, p_dw = 3, 1
            k_dwd, dil, p_dwd = 3, 1, 1
        else:
            raise ValueError(f"unsupported dim {dim}")
        u = x
        attn = Conv3d(dim, k_dw, padding=p_dw, groups=dim,
                      name="conv0")(x)
        attn = Conv3d(dim, k_dwd, padding=p_dwd, dilation=dil,
                      groups=dim, name="conv_spatial")(attn)
        attn = DeformConvPack3d(name="deform_conv")(attn)
        attn = Conv3d(dim, 1, name="conv1")(attn)
        return u * attn


class LKA3dConv(nn.Module):
    """Ablation: plain 3³ conv instead of deformable
    (transformerblock.py:746-764)."""

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        u = x
        attn = _dw_pair3d(x, dim)
        attn = Conv3d(dim, 3, padding=1, name="conv")(attn)
        attn = Conv3d(dim, 1, name="conv1")(attn)
        return u * attn


class LKA3dDeformSizeAware(nn.Module):
    """Dim-dependent kernels used by the *_sequential ablations
    (transformerblock.py:1803-1833): 7/5 for dim≤64, 5(d3)/5 for 128,
    3(d2)/3 for 256, each followed by DeformConvPack 3³."""

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        if dim in (32, 64):
            k_dwd, dil, p_dwd, k_dw, p_dw = 7, 3, 9, 5, 2
        elif dim == 128:
            k_dwd, dil, p_dwd, k_dw, p_dw = 5, 3, 6, 5, 2
        elif dim == 256:
            k_dwd, dil, p_dwd, k_dw, p_dw = 3, 2, 2, 3, 1
        else:
            raise ValueError(f"unsupported dim {dim}")
        u = x
        if (k_dw, k_dwd, dil) == (5, 7, 3):
            attn = _dw_pair3d(x, dim)
        else:
            attn = Conv3d(dim, k_dw, padding=p_dw, groups=dim,
                          name="conv0")(x)
            attn = Conv3d(dim, k_dwd, padding=p_dwd, dilation=dil,
                          groups=dim, name="conv_spatial")(attn)
        attn = DeformConvPack3d(name="deform_conv")(attn)
        attn = Conv3d(dim, 1, name="conv1")(attn)
        return u * attn


class GatedAttention3d(nn.Module):
    """proj_1 → GELU → gating unit → proj_2 + residual, on NDHWC
    (LKA_Attention3d and friends, transformerblock.py:395-414)."""
    gate: Callable = LKA3d

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        shortcut = x
        x = Conv3d(dim, 1, name="proj_1")(x)
        x = gelu(x)
        x = self.gate(name="spatial_gating_unit")(x)
        x = Conv3d(dim, 1, name="proj_2")(x)
        return x + shortcut


class SliceDeformableLKA2d(nn.Module):
    """The 2D-slice deformable LKA used by TransformerBlock_2Dsingle
    (transformerblock.py:450-496). The reference loops python-side over the
    last spatial axis applying a 2D deformable LKA per slice; here the
    slice axis folds into batch, so one batched 2D kernel call covers the
    whole volume."""

    @nn.compact
    def __call__(self, x):
        # x: (B, S1, S2, S3, C); slices are taken over S3 with (S1, S2) as
        # the 2D plane — matching x[:, :, :, :, i] on (B, C, H, W, D).
        B, S1, S2, S3, C = x.shape
        shortcut = x
        x2 = x.transpose(0, 3, 1, 2, 4).reshape(B * S3, S1, S2, C)
        y = Conv2d(C, 1, name="proj_1")(x2)
        y = gelu(y)
        # deformable_LKA gate (5×5 then 7×7 d3, both with 3×3 offset nets)
        u = y
        attn = DeformConv2dSlice(kernel_size=(5, 5), padding=2, groups=C,
                                 name="conv0")(y)
        attn = DeformConv2dSlice(kernel_size=(7, 7), padding=9, dilation=3,
                                 groups=C, name="conv_spatial")(attn)
        attn = Conv2d(C, 1, name="conv1")(attn)
        y = u * attn
        y = Conv2d(C, 1, name="proj_2")(y)
        y = y.reshape(B, S3, S1, S2, C).transpose(0, 2, 3, 1, 4)
        return y + shortcut


# ---------------------------------------------------------------------------
# Token-space attentions
# ---------------------------------------------------------------------------

class EPA(nn.Module):
    """Efficient Paired Attention (UNETR++-style), transformerblock.py:68-138.

    Shared q/k; channel attention over (C/h × C/h) and spatial attention
    with K,V projected from N tokens to `proj_size` by a shared E=F linear;
    half-width output projections concatenated.
    """
    input_size: int
    proj_size: int
    num_heads: int = 4
    dropout_rate: float = 0.1
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        h = self.num_heads
        ch = C // h
        qkvv = Linear(C * 4, use_bias=False, name="qkvv")(x)
        qkvv = qkvv.reshape(B, N, 4, h, ch).transpose(2, 0, 3, 1, 4)
        q, k, v_ca, v_sa = qkvv[0], qkvv[1], qkvv[2], qkvv[3]
        # transpose(-2, -1): (B, h, ch, N)
        q = q.transpose(0, 1, 3, 2)
        k = k.transpose(0, 1, 3, 2)
        v_ca = v_ca.transpose(0, 1, 3, 2)
        v_sa = v_sa.transpose(0, 1, 3, 2)

        # Shared E==F projection N → proj_size.
        proj = Linear(self.proj_size, use_bias=True, name="E")
        k_proj = proj(k)        # (B, h, ch, p)
        v_sa_proj = proj(v_sa)  # (B, h, ch, p)

        qn = _l2norm(q)
        kn = _l2norm(k)
        t1 = self.param("temperature", nn.initializers.ones, (h, 1, 1))
        t2 = self.param("temperature2", nn.initializers.ones, (h, 1, 1))

        drop = nn.Dropout(self.dropout_rate, deterministic=self.deterministic)
        drop2 = nn.Dropout(self.dropout_rate, deterministic=self.deterministic)

        # Channel attention: (B,h,ch,ch')
        attn_ca = jnp.einsum("bhcn,bhdn->bhcd", qn, kn) * t1
        attn_ca = drop(_softmax(attn_ca))
        x_ca = jnp.einsum("bhcd,bhdn->bhcn", attn_ca, v_ca)
        x_ca = x_ca.transpose(0, 3, 1, 2).reshape(B, N, C)

        # Spatial attention: (B,h,N,p)
        attn_sa = jnp.einsum("bhcn,bhcp->bhnp", qn, k_proj) * t2
        attn_sa = drop2(_softmax(attn_sa))
        x_sa = jnp.einsum("bhnp,bhcp->bhnc", attn_sa, v_sa_proj)
        # Reference quirk (transformerblock.py:126): permute(0,3,1,2) then
        # reshape(B,N,C) reinterprets the (ch,h,N) layout row-major.
        x_sa = x_sa.transpose(0, 3, 1, 2).reshape(B, N, C)

        x_sa = Linear(C // 2, name="out_proj")(x_sa)
        x_ca = Linear(C // 2, name="out_proj2")(x_ca)
        return jnp.concatenate([x_sa, x_ca], axis=-1)


class EfficientAttention(nn.Module):
    """Linear-attention variant (transformerblock.py:144-214): softmax(K)
    over tokens, softmax(Q) over channels, context = K V^T."""
    num_heads: int = 4
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        h = self.num_heads
        ch = C // h
        q = Linear(C, use_bias=self.qkv_bias, name="query_lin")(x)
        k = Linear(C, use_bias=self.qkv_bias, name="key_lin")(x)
        v = Linear(C, use_bias=self.qkv_bias, name="value_lin")(x)
        # (B, C, N) → heads over channel blocks
        q = q.transpose(0, 2, 1).reshape(B, h, ch, N)
        k = k.transpose(0, 2, 1).reshape(B, h, ch, N)
        v = v.transpose(0, 2, 1).reshape(B, h, ch, N)
        k = _softmax(k, axis=-1)          # over tokens
        q = _softmax(q, axis=-2)          # over channels within head
        context = jnp.einsum("bhcn,bhdn->bhcd", k, v)   # (B,h,ck,cv)
        att = jnp.einsum("bhcd,bhcn->bhdn", context, q)  # (B,h,cv,N)
        att = att.reshape(B, C, N).transpose(0, 2, 1)
        return Linear(C, name="reprojection")(att)


class ChannelOnlyAttention(nn.Module):
    """The channel-attention half used by the paired LKA variants
    (transformerblock.py:1001-1041): qkv → normalized q,k → (C/h)² map."""
    num_heads: int = 4
    dropout_rate: float = 0.1
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        h = self.num_heads
        ch = C // h
        qkv = Linear(C * 3, use_bias=False, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, h, ch).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = _l2norm(q.transpose(0, 1, 3, 2))
        k = _l2norm(k.transpose(0, 1, 3, 2))
        v = v.transpose(0, 1, 3, 2)
        t1 = self.param("temperature", nn.initializers.ones, (h, 1, 1))
        attn = jnp.einsum("bhcn,bhdn->bhcd", q, k) * t1
        attn = nn.Dropout(self.dropout_rate,
                          deterministic=self.deterministic)(_softmax(attn))
        out = jnp.einsum("bhcd,bhdn->bhcn", attn, v)
        return out.transpose(0, 3, 1, 2).reshape(B, N, C)


class SpatialOnlyAttention(nn.Module):
    """The spatial-attention half (transformerblock.py:820-867): q
    normalised, K/V projected to proj_size via shared E=F."""
    input_size: int
    proj_size: int
    num_heads: int = 4
    dropout_rate: float = 0.1
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        h = self.num_heads
        ch = C // h
        qkv = Linear(C * 3, use_bias=False, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, h, ch).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q.transpose(0, 1, 3, 2)
        k = k.transpose(0, 1, 3, 2)
        v = v.transpose(0, 1, 3, 2)
        proj = Linear(self.proj_size, use_bias=True, name="E")
        k_proj = proj(k)
        v_proj = proj(v)
        qn = _l2norm(q)
        t1 = self.param("temperature", nn.initializers.ones, (h, 1, 1))
        attn = jnp.einsum("bhcn,bhcp->bhnp", qn, k_proj) * t1
        attn = nn.Dropout(self.dropout_rate,
                          deterministic=self.deterministic)(_softmax(attn))
        out = jnp.einsum("bhnp,bhcp->bhnc", attn, v_proj)
        # Same permute quirk as EPA.
        return out.transpose(0, 3, 1, 2).reshape(B, N, C)
