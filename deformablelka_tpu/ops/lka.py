"""Large-Kernel Attention (LKA) decomposition ops.

Reference behaviour reproduced (re-derived):
  /root/reference/2D/deformable_LKA/LKA.py:4-18 — LKA(x) =
  conv1x1(dw_dilated7(dw5(x))) used as a multiplicative gate `u * attn`.
  3D analogue at /root/reference/2D/deformable_LKA/LKA3d.py:4-22 and
  3D/.../synapse/transformerblock.py:349-392 (5³ dw → 7³ dw dilation-3 →
  1×1×1, gate).

The composition is left to XLA fusion by default; `lka2d`/`lka3d` take the
three weight sets and apply the whole decomposition so a future Pallas
kernel can swap in behind the same signature (see ops/pallas/).
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from deformablelka_tpu.ops.convs import conv2d, conv3d, depthwise_conv2d, depthwise_conv3d


def lka_impl() -> str:
    """LKA chain implementation: 'chain' (default, two XLA depthwise
    convs — XLA fuses the 1×1+gate) or 'fused' (both depthwise stages
    in ONE Pallas kernel, ops/pallas/lka_fused_kernel; falls back to
    'chain' off-TPU or when the lane bound W+22>128 is exceeded)."""
    return os.environ.get("DLKA_LKA_IMPL", "chain")


def dw_chain2d(x, w_dw, b_dw, w_dil, b_dil):
    """dw5² → dw7²-dil3 (+biases), impl-dispatched (see lka_impl)."""
    if lka_impl() == "fused":
        from deformablelka_tpu.ops.pallas.lka_fused_kernel import (
            dw_chain2d_fused, lka2d_fused_supported)
        if lka2d_fused_supported(*x.shape[1:3]):
            return dw_chain2d_fused(x, w_dw, b_dw, w_dil, b_dil)
    attn = depthwise_conv2d(x, w_dw, padding=2, bias=b_dw)
    return depthwise_conv2d(attn, w_dil, padding=9, dilation=3, bias=b_dil)


def dw_chain3d(x, w_dw, b_dw, w_dil, b_dil):
    """dw5³ → dw7³-dil3 (+biases), impl-dispatched (see lka_impl)."""
    if lka_impl() == "fused":
        from deformablelka_tpu.ops.pallas.lka_fused_kernel import (
            dw_chain3d_fused, lka3d_fused_supported)
        if lka3d_fused_supported(*x.shape[1:4]):
            return dw_chain3d_fused(x, w_dw, b_dw, w_dil, b_dil)
    attn = depthwise_conv3d(x, w_dw, padding=2, bias=b_dw)
    return depthwise_conv3d(attn, w_dil, padding=9, dilation=3, bias=b_dil)


def lka2d(x, w_dw, b_dw, w_dil, b_dil, w_pw, b_pw):
    """LKA gate: x * conv1x1(dwdil7x7(dw5x5(x))).

    x: (B, H, W, C); w_dw: (5, 5, 1, C); w_dil: (7, 7, 1, C) applied with
    dilation 3 and padding 9; w_pw: (1, 1, C, C).
    """
    attn = dw_chain2d(x, w_dw, b_dw, w_dil, b_dil)
    attn = conv2d(attn, w_pw, bias=b_pw)
    return x * attn


def lka3d(x, w_dw, b_dw, w_dil, b_dil, w_pw, b_pw):
    """3D LKA gate: x * conv1x1x1(dwdil7³(dw5³(x)))."""
    attn = dw_chain3d(x, w_dw, b_dw, w_dil, b_dil)
    attn = conv3d(attn, w_pw, bias=b_pw)
    return x * attn
