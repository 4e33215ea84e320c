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

import contextlib as _contextlib
import os as _os
import threading as _threading

_IMPL_OVERRIDE = _threading.local()


@_contextlib.contextmanager
def deform_impl(name: str):
    """Trace-time override of the deform-conv implementation.

    Dispatch happens while JAX traces, so wrapping the traced region
    (e.g. the loss closure inside `jax.jit`) pins the impl for that
    program regardless of DLKA_DEFORM_IMPL. Used by the training step
    so the trained path is explicit and independently probed: with the
    explicit scatter-free window VJPs (deform3d._window_core_bwd) the
    flagship train step measures 1.87 s/step under 'hybrid' vs 25.2
    for 'gather' and 9.3 for 'window' R=2 (same loss to 4 decimals;
    PERF.md "Training step", probed 2026-08-17). Before those VJPs,
    XLA autodiff of the window scan crashed the remote TPU compiler —
    DLKA_DEFORM_IMPL_TRAIN=gather remains the escape hatch."""
    prev = getattr(_IMPL_OVERRIDE, "v", None)
    _IMPL_OVERRIDE.v = name
    try:
        yield
    finally:
        _IMPL_OVERRIDE.v = prev


def train_impl() -> str:
    """Implementation for training programs (see `deform_impl`).

    Default 'hybrid' since round 4: the pallas forward inside
    value_and_grad no longer crashes the remote compiler (re-probed
    2026-08-19, benchmarks/probe_train_r4.py repro: grad of
    DeformConvPack3d compiles at all stage shapes) and the flagship
    step measures 3.404 s vs 3.565 for 'hybridw' (same-session matrix,
    identical loss to 4 decimals). The backward is unchanged either
    way — the pallas custom VJP delegates to the scatter-free window
    backward. DLKA_DEFORM_IMPL_TRAIN=hybridw/gather are the escape
    hatches."""
    return _os.environ.get("DLKA_DEFORM_IMPL_TRAIN", "hybrid")


def _impl() -> str:
    """Deform-conv implementation (DLKA_DEFORM_IMPL):
    'gather'  — reference-exact, unbounded offsets.
    'window'  — XLA dense-window, exact for |Δ|≤radius (clips beyond).
    'pallas'  — Pallas window kernel (VMEM tiles + MXU mixing), same
                clip semantics as 'window'.
    'hybrid'  — EXACT for any offsets: a traced `lax.cond` on
                max|Δ| ≤ R picks the window/pallas fast path when it
                is lossless and falls back to the gather otherwise.
                Trained checkpoints measure absmax(Δ)=0.034 (PERF.md
                2026-08-17), so the fast branch always runs in
                practice while the semantics stay reference-exact.
                DEFAULT since 2026-08-17: 1.38x the A100 baseline on
                the full bench protocol vs 0.76x for gather. The 3D
                fast branch is the pallas-v3 kernel where eligible
                (R=1, C≤32, 3³ s1; in-program 5.1 vs 7.15 ms window
                at stage-0) and the XLA window otherwise.
    'hybridw' — hybrid pinned to the XLA-window fast branch; was the
                training default until round 4 (training now defaults
                to 'hybrid' too — see `train_impl`)."""
    v = getattr(_IMPL_OVERRIDE, "v", None)
    if v is not None:
        return v
    return _os.environ.get("DLKA_DEFORM_IMPL", "hybrid")


DEFORM_WINDOW_RADIUS = int(_os.environ.get("DLKA_DEFORM_RADIUS", "2"))
# hybrid uses the smallest (fastest) window since exactness no longer
# depends on the clip: (2R+1)^3 window terms with R=1 → 27 per tap
HYBRID_RADIUS = int(_os.environ.get("DLKA_HYBRID_RADIUS", "1"))


def deform_conv2d(x, offset, w, bias=None, *, stride=1, padding=0,
                  dilation=1, groups: int = 1):
    from deformablelka_tpu.ops.convs import _tuple as _t
    impl = _impl()
    if impl in ("hybrid", "hybridw") and tuple(_t(stride, 2)) == (1, 1):
        import jax as _jax
        import jax.numpy as _jnp
        from deformablelka_tpu.ops.pallas.deform2d_kernel import (
            deform_dw_conv2d_pallas, pallas2d_supported)
        R = HYBRID_RADIUS
        # 2D fast-branch kernel: the pallas dw kernel where supported.
        # Gated opt-in (DLKA_HYBRID_FAST_2D=pallas) until the 2D
        # end-to-end gate_model_ab A/B decides the default — the r3
        # verdict's open item 4 (2D stalled at 5.9 ms).
        fast_pref = _os.environ.get("DLKA_HYBRID_FAST_2D", "window")
        # 'auto' = pallas only at the small-spatial sites where the
        # bare-op A/B favours it (probe_deform2d_pallas_r5: 14²C384
        # 7×7d3 pallas 0.119 vs window 0.394 ms; at 56²C96 the window
        # wins 0.097 vs 0.819). Model gate 2026-08-20: auto 5.88/5.91
        # vs window 5.83/5.83 — the isolated small-site win does not
        # compose (eighth such result); 'window' stays the default and
        # 'auto' is a documented opt-in.
        want_pallas = (fast_pref == "pallas"
                       or (fast_pref == "auto"
                           and x.shape[1] * x.shape[2] <= 196))
        use_pallas = (impl == "hybrid" and want_pallas
                      and pallas2d_supported(
                          w.shape, stride, _t(padding, 2), dilation,
                          groups, x.shape[-1], x.shape[1:3]))
        dl2 = _t(dilation, 2)[0]

        def fast(ops):
            x, offset, w = ops
            if use_pallas:
                return deform_dw_conv2d_pallas(x, offset, w, R,
                                               dl2).astype(x.dtype)
            return deform_conv2d_window(
                x, offset, w, None, stride=stride, padding=padding,
                dilation=dilation, groups=groups,
                radius=R).astype(x.dtype)

        def slow(ops):
            x, offset, w = ops
            return deform_conv2d_gather(
                x, offset, w, None, stride=stride, padding=padding,
                dilation=dilation, groups=groups).astype(x.dtype)

        small = _jnp.max(_jnp.abs(offset.astype(_jnp.float32))) <= R
        if _os.environ.get("DLKA_HYBRID_FORM_2D", "branch") == "residual":
            # Residual form (NEGATIVE RESULT, kept opt-in for the
            # record): the fast branch ALWAYS runs (outside any cond,
            # so it can fuse with the surrounding gelu/proj ops) and
            # the cond gates only the f32 CORRECTION gather−fast,
            # which is zero whenever |off| ≤ R (window == gather
            # exactly there). Motivation: 2D carries 8 per-op conds
            # and the cond-free pin measures 5.57 vs 5.93 ms/fwd
            # in-context. Gate 2026-08-20 (--model=2d, interleaved):
            # residual 6.37/6.39 vs branch 5.87 — the f32 w_out
            # materialisation at every site costs more than the cond
            # saves. Branch form stays the default; exact either way
            # (parity test covers both offsets regimes).
            w_out = fast((x, offset, w)).astype(_jnp.float32)

            def corr(ops):
                return (slow(ops[:3]).astype(_jnp.float32) - ops[3])

            out = (w_out + _jax.lax.cond(
                small, lambda o: _jnp.zeros_like(o[3]), corr,
                (x, offset, w, w_out))).astype(x.dtype)
        else:
            out = _jax.lax.cond(small, fast, slow, (x, offset, w))
        return out if bias is None else out + bias.astype(out.dtype)
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
    if (impl in ("hybrid", "hybridw")
            and tuple(_t(stride, 3)) == (1, 1, 1)):
        import jax as _jax
        import jax.numpy as _jnp
        from deformablelka_tpu.ops.pallas.deform3d_kernel import (
            _kernel_version, deform_conv3d_pallas, pallas_supported)
        R = HYBRID_RADIUS
        kd, kh, kw = w.shape[:3]
        # in-program A/B at stage-0 (32³ C32, R1), 2026-08-18: pallas
        # v3 (tap-inner grid + in-kernel dot) 5.1 ms vs window 7.15 —
        # the fast branch defaults to pallas where v3 is eligible.
        # 'hybridw' (the training default, ops.train_impl) and
        # DLKA_HYBRID_FAST=window pin the window branch instead.
        fast_pref = _os.environ.get("DLKA_HYBRID_FAST", "pallas")
        # NOT a version allow-list: r3 shipped a silent regression when
        # this gate said == "v3" and the v4 dispatcher stopped matching.
        # Any fused-dot kernel (v3+) is a valid fast branch; only the
        # v1/v2 external-GEMM kernels are excluded.
        use_pallas = (impl == "hybrid" and fast_pref == "pallas"
                      and _kernel_version(R, x.shape[-1]) not in
                      ("v1", "v2")
                      and pallas_supported(
                          kd, kh, kw, stride, padding, dilation, groups,
                          x.shape[-1], w.shape[-1],
                          spatial=x.shape[1:4]))

        def fast(ops):
            x, offset, w = ops
            if use_pallas:
                out = deform_conv3d_pallas(x, offset, w, R)
            else:
                out = deform_conv3d_window(
                    x, offset, w, None, stride=stride, padding=padding,
                    dilation=dilation, groups=groups, radius=R)
            return out.astype(x.dtype)

        def slow(ops):
            x, offset, w = ops
            return deform_conv3d_gather(
                x, offset, w, None, stride=stride, padding=padding,
                dilation=dilation, groups=groups).astype(x.dtype)

        small = _jnp.max(_jnp.abs(offset.astype(_jnp.float32))) <= R
        out = _jax.lax.cond(small, fast, slow, (x, offset, w))
        return out if bias is None else out + bias.astype(out.dtype)
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
