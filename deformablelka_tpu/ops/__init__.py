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
from deformablelka_tpu.ops.deform2d import (
    deform_conv2d as deform_conv2d_gather,
    deform_conv2d_window,
)
from deformablelka_tpu.ops.deform3d import (
    deform_conv3d as deform_conv3d_gather,
    deform_conv3d_window,
)
from deformablelka_tpu.ops.lka import lka2d, lka3d

import os as _os


def _impl() -> str:
    """Deform-conv implementation (DLKA_DEFORM_IMPL):
    'gather'  — reference-exact, unbounded offsets; best END-TO-END on
                the round-1 tunneled chip (PERF.md), so the default.
    'window'  — XLA dense-window, exact for |Δ|≤radius.
    'pallas'  — lane-packed Pallas kernel (VMEM window + MXU
                mixing). Fast mode: DLKA_DEFORM_IMPL=pallas
                DLKA_DEFORM_RADIUS=1 beats the exact gather 1.4x at
                the stage-1 shape (PERF.md), clipping offsets to
                |d| <= 1."""
    return _os.environ.get("DLKA_DEFORM_IMPL", "gather")


DEFORM_WINDOW_RADIUS = int(_os.environ.get("DLKA_DEFORM_RADIUS", "2"))


def deform_conv2d(x, offset, w, bias=None, *, stride=1, padding=0,
                  dilation=1, groups: int = 1):
    from deformablelka_tpu.ops.convs import _tuple as _t
    impl = _impl()
    if impl == "pallas":
        from deformablelka_tpu.ops.pallas.deform2d_kernel import (
            deform_dw_conv2d_pallas, pallas2d_supported)
        dl = _t(dilation, 2)[0]
        if pallas2d_supported(w.shape, stride, _t(padding, 2), dilation,
                              groups, x.shape[-1], x.shape[1:3]):
            out = deform_dw_conv2d_pallas(x, offset, w,
                                          DEFORM_WINDOW_RADIUS, dl)
            return out if bias is None else out + bias.astype(out.dtype)
    if impl in ("window", "pallas") and tuple(_t(stride, 2)) == (1, 1):
        return deform_conv2d_window(
            x, offset, w, bias, stride=stride, padding=padding,
            dilation=dilation, groups=groups,
            radius=DEFORM_WINDOW_RADIUS)
    return deform_conv2d_gather(x, offset, w, bias, stride=stride,
                                padding=padding, dilation=dilation,
                                groups=groups)


def deform_conv3d(x, offset, w, bias=None, *, stride=1, padding=0,
                  dilation=1, groups: int = 1):
    from deformablelka_tpu.ops.convs import _tuple as _t
    impl = _impl()
    if impl in ("window", "pallas"):
        from deformablelka_tpu.ops.pallas.deform3d_kernel import (
            deform_conv3d_pallas, pallas_supported)
        kd, kh, kw = w.shape[:3]
        if impl == "pallas" and pallas_supported(
                kd, kh, kw, stride, padding, dilation, groups,
                x.shape[-1], w.shape[-1], spatial=x.shape[1:4]):
            out = deform_conv3d_pallas(x, offset, w,
                                       DEFORM_WINDOW_RADIUS)
            return out if bias is None else out + bias.astype(out.dtype)
        if tuple(_t(stride, 3)) == (1, 1, 1):
            return deform_conv3d_window(
                x, offset, w, bias, stride=stride, padding=padding,
                dilation=dilation, groups=groups,
                radius=DEFORM_WINDOW_RADIUS)
    return deform_conv3d_gather(x, offset, w, bias, stride=stride,
                                padding=padding, dilation=dilation,
                                groups=groups)


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
