"""UNet building blocks (MONAI dynunet-derived behaviour, channels-last).

Parity targets:
  /root/reference/3D/d_lka_former/network_architecture/dynunet_block.py:12-248
  — UnetResBlock (conv-norm-lrelu ×2 + projected residual), UnetBasicBlock,
  UnetUpBlock (transposed conv + concat + basic block), UnetOutBlock (1×1),
  with padding (k-s+1)//2 and LeakyReLU(0.01).

Norms: `norm_name` "instance" → InstanceNorm(affine), "batch" → BatchNorm
(matching MONAI get_norm_layer semantics used at dynunet_block.py:55,126).
Works for both 2D (B,H,W,C) and 3D (B,D,H,W,C) inputs.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax.numpy as jnp
import flax.linen as nn

from deformablelka_tpu.nn.layers import Conv2d, Conv3d, ConvTranspose
from deformablelka_tpu.nn.norms import BatchNorm, InstanceNorm


def _conv(spatial_dims, features, kernel_size, stride=1, name=None,
          use_bias=False):
    cls = Conv3d if spatial_dims == 3 else Conv2d
    return cls(features, kernel_size, stride=stride, padding="same",
               use_bias=use_bias, name=name)


def _norm(norm_name, name, train=False):
    if isinstance(norm_name, (tuple, list)):
        norm_name = norm_name[0]
    if norm_name == "instance":
        # monai get_norm_layer("instance") builds nn.InstanceNorm3d with
        # the torch default affine=False — the reference's encoder1 /
        # decoder UnetResBlocks carry NO instance-norm weights (verified
        # against an instantiated D_LKA_Former state_dict).
        return InstanceNorm(affine=False, name=name)
    if norm_name == "batch":
        return BatchNorm(name=name, use_running_average=not train)
    if norm_name == "group":
        raise ValueError("group norm needs num_groups; use GroupNorm directly")
    raise ValueError(f"unsupported norm {norm_name}")


def lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.01)


class UnetResBlock(nn.Module):
    spatial_dims: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]]
    stride: Union[int, Sequence[int]] = 1
    norm_name: str = "instance"
    train: bool = False

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        stride_list = (self.stride if isinstance(self.stride, (tuple, list))
                       else [self.stride])
        downsample = (in_channels != self.out_channels
                      or any(s != 1 for s in stride_list))
        if self._use_s2d(x, stride_list):
            return self._call_s2d(x, downsample)
        out = _conv(self.spatial_dims, self.out_channels, self.kernel_size,
                    self.stride, name="conv1")(x)
        out = _norm(self.norm_name, "norm1", self.train)(out)
        out = lrelu(out)
        out = _conv(self.spatial_dims, self.out_channels, self.kernel_size,
                    1, name="conv2")(out)
        out = _norm(self.norm_name, "norm2", self.train)(out)
        residual = x
        if downsample:
            residual = _conv(self.spatial_dims, self.out_channels, 1,
                             self.stride, name="conv3")(residual)
            residual = _norm(self.norm_name, "norm3", self.train)(residual)
        return lrelu(out + residual)

    def _use_s2d(self, x, stride_list):
        """Whole-block space-to-depth fast path eligibility.

        At full-resolution small-C shapes the per-conv s2d rewrite is
        MXU-fast (0.38 ms vs 1.6 emitter at 64×128×128 C16) but each
        conv pays ~0.9 ms of pack/unpack transposes that XLA does NOT
        elide across the interleaved norm/lrelu ops — the composed
        block measured 6.3 ms against ~1 ms of parts
        (benchmarks/probe_fullres_pair_r3.py, 2026-08-19). Packing
        ONCE per block and running conv/IN/lrelu/residual in s2d space
        (exact: stats reduce over the corner axis too) removes all
        interior transposes. Instance-norm-only (affine-free, matching
        the reference's blocks) and 3³/stride-1 only.

        Like every DLKA_*_IMPL knob, DLKA_RESBLOCK_S2D is read at TRACE
        time: flipping it after a function is jit-compiled has no
        effect until a retrace (a fresh `jax.jit` wrapper, or bare
        `apply()` which retraces per call)."""
        import os
        norm = self.norm_name
        if isinstance(norm, (tuple, list)):
            norm = norm[0]
        from deformablelka_tpu.ops.convs import _tuple
        return (self.spatial_dims == 3
                and norm == "instance"
                and tuple(_tuple(self.kernel_size, 3)) == (3, 3, 3)
                and all(s == 1 for s in stride_list)
                and x.ndim == 5
                and all(d % 2 == 0 for d in x.shape[1:4])
                and x.shape[1] * x.shape[2] * x.shape[3] >= (1 << 17)
                and x.shape[-1] <= 32 and self.out_channels <= 32
                and os.environ.get("DLKA_RESBLOCK_S2D", "1") == "1")

    def _call_s2d(self, x, downsample):
        from deformablelka_tpu.ops.convs import (
            s2d_pack, s2d_unpack, conv3d_s2d_space, conv1x1_s2d_space,
            instance_norm_s2d_space)
        Co = self.out_channels
        w1, _ = Conv3d(Co, self.kernel_size, stride=1, padding="same",
                       use_bias=False, as_params=True, name="conv1")(x)
        stub = jnp.zeros((1, 2, 2, 2, Co), x.dtype)
        w2, _ = Conv3d(Co, self.kernel_size, stride=1, padding="same",
                       use_bias=False, as_params=True, name="conv2")(stub)
        X = s2d_pack(x)
        out = conv3d_s2d_space(X, w1)
        out = instance_norm_s2d_space(out, Co)
        out = lrelu(out)
        out = conv3d_s2d_space(out, w2)
        out = instance_norm_s2d_space(out, Co)
        if downsample:
            w3, _ = Conv3d(Co, 1, stride=1, padding="same",
                           use_bias=False, as_params=True,
                           name="conv3")(x)
            residual = conv1x1_s2d_space(X, w3)
            residual = instance_norm_s2d_space(residual, Co)
        else:
            residual = X
        return s2d_unpack(lrelu(out + residual), Co)


class UnetBasicBlock(nn.Module):
    spatial_dims: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]]
    stride: Union[int, Sequence[int]] = 1
    norm_name: str = "instance"
    train: bool = False

    @nn.compact
    def __call__(self, x):
        out = _conv(self.spatial_dims, self.out_channels, self.kernel_size,
                    self.stride, name="conv1")(x)
        out = _norm(self.norm_name, "norm1", self.train)(out)
        out = lrelu(out)
        out = _conv(self.spatial_dims, self.out_channels, self.kernel_size,
                    1, name="conv2")(out)
        out = _norm(self.norm_name, "norm2", self.train)(out)
        return lrelu(out)


class UnetUpBlock(nn.Module):
    spatial_dims: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]]
    upsample_kernel_size: Union[int, Sequence[int]]
    norm_name: str = "instance"

    @nn.compact
    def __call__(self, x, skip):
        out = ConvTranspose(self.out_channels, self.upsample_kernel_size,
                            stride=self.upsample_kernel_size, use_bias=False,
                            name="transp_conv")(x)
        out = jnp.concatenate([out, skip], axis=-1)
        out = UnetBasicBlock(self.spatial_dims, self.out_channels,
                             self.kernel_size, 1, self.norm_name,
                             name="conv_block")(out)
        return out


class UnetOutBlock(nn.Module):
    spatial_dims: int
    out_channels: int

    @nn.compact
    def __call__(self, x):
        return _conv(self.spatial_dims, self.out_channels, 1, 1,
                     use_bias=True, name="conv")(x)
