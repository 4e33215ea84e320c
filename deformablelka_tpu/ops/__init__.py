"""Core compute ops: convolution helpers, deformable convolutions, LKA.

All ops are channels-last, jit-compatible, and differentiable.
"""

from deformablelka_tpu.ops.convs import (
    conv2d,
    conv3d,
    conv_transpose,
    depthwise_conv2d,
    depthwise_conv3d,
    same_padding,
)
from deformablelka_tpu.ops.deform2d import deform_conv2d
from deformablelka_tpu.ops.deform3d import deform_conv3d
from deformablelka_tpu.ops.lka import lka2d, lka3d

__all__ = [
    "conv2d",
    "conv3d",
    "conv_transpose",
    "depthwise_conv2d",
    "depthwise_conv3d",
    "same_padding",
    "deform_conv2d",
    "deform_conv3d",
    "lka2d",
    "lka3d",
]
