"""Generic 3D/2D nnU-Net (the reference's baseline/cascade network).

Reference behaviour (re-derived):
  /root/reference/3D/d_lka_former/network_architecture/generic_UNet.py —
  Conv-Norm-LReLU ×2 per stage (ConvDropoutNormNonlin), features double
  per pool capped at 320 (3D) / 512 (2D), strided-conv downsampling,
  transposed-conv upsampling, concat skips, 1×1 seg heads per decoder
  stage for deep supervision, nonlin LeakyReLU(0.01), InstanceNorm.
  Pool/conv kernel sizes come from the experiment plans
  (experiment_planner_baseline_3DUNet.py:247-357).

TPU-first: channels-last NDHWC, bf16-friendly (norms in fp32), static
shapes; the network is a plain flax module usable under pjit with
batch-dim sharding.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from deformablelka_tpu.nn.norms import InstanceNorm


def lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.01)


class ConvNormLRelu(nn.Module):
    features: int
    kernel: Sequence[int] = (3, 3, 3)
    stride: Sequence[int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x):
        # torch-style symmetric padding (k//2 both sides): flax "SAME"
        # pads (0, 1) on strided even inputs, shifting the grid by one
        # voxel vs the reference conv
        pad = [(k // 2, k // 2) for k in tuple(self.kernel)]
        x = nn.Conv(self.features, tuple(self.kernel),
                    strides=tuple(self.stride), padding=pad,
                    name="conv")(x)
        x = InstanceNorm(name="norm")(x)
        return lrelu(x)


class StackedConvLayers(nn.Module):
    features: int
    first_stride: Optional[Sequence[int]] = None   # default all-1s
    kernel: Sequence[int] = (3, 3, 3)
    n_convs: int = 2
    residual: bool = False  # residual planner variant: y = convs(x) + proj(x)

    @nn.compact
    def __call__(self, x):
        inp = x
        first_stride = (tuple(self.first_stride) if self.first_stride
                        is not None else (1,) * len(tuple(self.kernel)))
        x = ConvNormLRelu(self.features, self.kernel, first_stride,
                          name="block0")(x)
        for i in range(1, self.n_convs):
            x = ConvNormLRelu(self.features, self.kernel,
                              (1,) * len(tuple(self.kernel)),
                              name=f"block{i}")(x)
        if self.residual:
            if (inp.shape[-1] != self.features
                    or any(s != 1 for s in first_stride)):
                inp = nn.Conv(self.features, (1,) * (inp.ndim - 2),
                              strides=first_stride,
                              use_bias=False, name="proj")(inp)
            x = x + inp
        return x


class GenericUNet(nn.Module):
    """num_pool stages; pool_op_kernel_sizes (num_pool, ndim) strides from
    the plans; returns deep-supervision list [full, 1/2, ...] when do_ds."""
    num_classes: int
    base_num_features: int = 32
    num_pool: int = 5
    pool_kernel_sizes: Sequence = None   # default (2,2,2) each
    conv_kernel_sizes: Sequence = None   # default (3,3,3) each stage
    max_features: int = 320
    do_ds: bool = True
    ndim: int = 3
    conv_per_stage: int = 2   # 3convperstage planner variant
    residual: bool = False    # residual planner variant

    @nn.compact
    def __call__(self, x):
        nd = self.ndim
        pools = (self.pool_kernel_sizes
                 or [(2,) * nd] * self.num_pool)
        kernels = (self.conv_kernel_sizes
                   or [(3,) * nd] * (self.num_pool + 1))
        feats = [min(self.base_num_features * 2 ** i, self.max_features)
                 for i in range(self.num_pool + 1)]

        skips = []
        h = x
        for s in range(self.num_pool):
            stride = (1,) * nd if s == 0 else pools[s - 1]
            h = StackedConvLayers(feats[s], first_stride=stride,
                                  kernel=kernels[s],
                                  n_convs=self.conv_per_stage,
                                  residual=self.residual,
                                  name=f"down{s}")(h)
            skips.append(h)
        h = StackedConvLayers(feats[self.num_pool],
                              first_stride=pools[self.num_pool - 1],
                              kernel=kernels[self.num_pool],
                              n_convs=self.conv_per_stage,
                              residual=self.residual,
                              name="bottleneck")(h)

        seg_outputs = []
        for s in reversed(range(self.num_pool)):
            h = nn.ConvTranspose(feats[s], tuple(pools[s]),
                                 strides=tuple(pools[s]),
                                 use_bias=False,  # transpconv bias=False
                                 name=f"up{s}")(h)
            h = jnp.concatenate([h, skips[s]], axis=-1)
            h = StackedConvLayers(feats[s], kernel=kernels[s],
                                  n_convs=self.conv_per_stage,
                                  residual=self.residual,
                                  name=f"dec{s}")(h)
            seg_outputs.append(
                nn.Conv(self.num_classes, (1,) * nd, use_bias=False,
                        name=f"seg{s}")(h))
        seg_outputs = seg_outputs[::-1]  # [full-res, /2, /4, ...]
        if self.do_ds:
            return seg_outputs[:3] if len(seg_outputs) >= 3 else seg_outputs
        return seg_outputs[0]


def generic_unet_3d_from_plans(plans_stage: dict, num_classes: int,
                               do_ds: bool = True,
                               plans: dict | None = None) -> GenericUNet:
    """Build from a plans stage dict (pool_op_kernel_sizes /
    conv_kernel_sizes lists, default_configuration.py pathway). Pass the
    top-level `plans` to pick up planner-variant knobs
    (conv_per_stage / residual)."""
    pools = plans_stage.get("pool_op_kernel_sizes")
    kernels = plans_stage.get("conv_kernel_sizes")
    num_pool = len(pools) if pools else 5
    plans = plans or {}
    return GenericUNet(num_classes=num_classes, num_pool=num_pool,
                       pool_kernel_sizes=pools, conv_kernel_sizes=kernels,
                       do_ds=do_ds,
                       conv_per_stage=int(plans.get("conv_per_stage", 2)),
                       residual=bool(plans.get("residual", False)))
