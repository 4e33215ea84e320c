"""Parity tests for the deformable conv ops against loop references.

Mirrors the role of /root/reference/3D/dcn/test.py (gradcheck + smoke) for
the new framework: forward parity vs an independent oracle, plus gradient
finite-difference checks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# The loop-reference parity tests target the gather implementation (the
# reference-exact path for UNBOUNDED offsets). The default dispatcher
# uses the dense-window path, which clips offsets to ±radius — its
# parity with the gather path is covered by the *_window tests below.
from deformablelka_tpu.ops import (
    deform_conv2d_gather as deform_conv2d,
    deform_conv3d_gather as deform_conv3d,
)
from tests.references import deform_conv2d_ref, deform_conv3d_ref


RNG = np.random.RandomState(0)


def test_deform2d_identity_offsets_match_conv():
    """Zero offsets must reduce to a plain convolution."""
    from deformablelka_tpu.ops import conv2d
    B, H, W, C = 2, 9, 11, 4
    x = RNG.randn(B, H, W, C).astype(np.float32)
    w = RNG.randn(3, 3, C, 8).astype(np.float32) * 0.3
    off = np.zeros((B, H, W, 2 * 9), np.float32)
    got = deform_conv2d(jnp.array(x), jnp.array(off), jnp.array(w),
                        stride=1, padding=1)
    want = conv2d(jnp.array(x), jnp.array(w), padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("groups,cout", [(1, 6), (3, 6), (6, 6)])
def test_deform2d_vs_reference(groups, cout):
    B, H, W, C = 2, 7, 8, 6
    kh = kw = 3
    x = RNG.randn(B, H, W, C).astype(np.float32)
    w = (RNG.randn(kh, kw, C // groups, cout) * 0.3).astype(np.float32)
    off = (RNG.randn(B, H, W, 2 * kh * kw) * 2.0).astype(np.float32)
    bias = RNG.randn(cout).astype(np.float32)
    got = deform_conv2d(jnp.array(x), jnp.array(off), jnp.array(w),
                        jnp.array(bias), stride=1, padding=1, groups=groups)
    want = deform_conv2d_ref(x, off, w, bias, stride=1, padding=1,
                             groups=groups)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_deform2d_dilated_5x5():
    """The D-LKA configuration: depthwise 5x5 then 7x7 dilation 3."""
    B, H, W, C = 1, 14, 14, 4
    x = RNG.randn(B, H, W, C).astype(np.float32)
    w = (RNG.randn(5, 5, 1, C) * 0.3).astype(np.float32)
    off = (RNG.randn(B, H, W, 2 * 25) * 3.0).astype(np.float32)
    got = deform_conv2d(jnp.array(x), jnp.array(off), jnp.array(w),
                        stride=1, padding=2, groups=C)
    want = deform_conv2d_ref(x, off, w, None, stride=1, padding=2, groups=C)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)

    w7 = (RNG.randn(7, 7, 1, C) * 0.2).astype(np.float32)
    off7 = (RNG.randn(B, H, W, 2 * 49) * 2.0).astype(np.float32)
    got7 = deform_conv2d(jnp.array(x), jnp.array(off7), jnp.array(w7),
                         stride=1, padding=9, dilation=3, groups=C)
    want7 = deform_conv2d_ref(x, off7, w7, None, stride=1, padding=9,
                              dilation=3, groups=C)
    np.testing.assert_allclose(np.asarray(got7), want7, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("groups,cout", [(1, 4)])
def test_deform3d_vs_reference(groups, cout):
    B, D, H, W, C = 1, 5, 6, 7, 4
    k = 3
    x = RNG.randn(B, D, H, W, C).astype(np.float32)
    w = (RNG.randn(k, k, k, C // groups, cout) * 0.3).astype(np.float32)
    off = (RNG.randn(B, D, H, W, 3 * k ** 3) * 1.5).astype(np.float32)
    bias = RNG.randn(cout).astype(np.float32)
    got = deform_conv3d(jnp.array(x), jnp.array(off), jnp.array(w),
                        jnp.array(bias), stride=1, padding=1, groups=groups)
    want = deform_conv3d_ref(x, off, w, bias, stride=1, padding=1,
                             groups=groups)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_deform3d_zero_offset_is_conv():
    from deformablelka_tpu.ops import conv3d
    B, D, H, W, C = 1, 4, 5, 6, 3
    x = RNG.randn(B, D, H, W, C).astype(np.float32)
    w = (RNG.randn(3, 3, 3, C, 5) * 0.3).astype(np.float32)
    off = np.zeros((B, D, H, W, 3 * 27), np.float32)
    got = deform_conv3d(jnp.array(x), jnp.array(off), jnp.array(w),
                        stride=1, padding=1)
    want = conv3d(jnp.array(x), jnp.array(w), padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_deform2d_grad_finite_difference():
    """Spot-check autodiff gradients vs central differences."""
    B, H, W, C = 1, 5, 5, 2
    x = RNG.randn(B, H, W, C).astype(np.float64).astype(np.float32)
    w = (RNG.randn(3, 3, 1, C) * 0.3).astype(np.float32)
    off = (RNG.randn(B, H, W, 18) * 0.7).astype(np.float32)

    def loss(x_, off_, w_):
        out = deform_conv2d(x_, off_, w_, stride=1, padding=1, groups=C)
        return jnp.sum(out ** 2)

    g_x, g_off, g_w = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.array(x), jnp.array(off), jnp.array(w))

    eps = 1e-3
    for (arr, grad, name) in ((off, g_off, "offset"), (w, g_w, "weight")):
        flat = arr.reshape(-1)
        for idx in RNG.choice(flat.size, size=6, replace=False):
            pert = flat.copy()
            pert[idx] += eps
            up = loss(jnp.array(x), *(
                (jnp.array(pert.reshape(arr.shape)), jnp.array(w))
                if name == "offset"
                else (jnp.array(off), jnp.array(pert.reshape(arr.shape)))))
            pert[idx] -= 2 * eps
            dn = loss(jnp.array(x), *(
                (jnp.array(pert.reshape(arr.shape)), jnp.array(w))
                if name == "offset"
                else (jnp.array(off), jnp.array(pert.reshape(arr.shape)))))
            fd = (float(up) - float(dn)) / (2 * eps)
            an = float(np.asarray(grad).reshape(-1)[idx])
            assert abs(fd - an) < 2e-1 * max(1.0, abs(fd)), (name, idx, fd, an)



def test_dispatcher_window_parity_with_gather():
    """ops.deform_conv3d / deform_conv2d (the dispatcher, default
    'window') equal the gather path when offsets are inside the window
    radius."""
    from deformablelka_tpu import ops

    rng = np.random.RandomState(0)
    x3 = jnp.asarray(rng.randn(1, 5, 6, 7, 4), jnp.float32)
    off3 = jnp.asarray(rng.uniform(-1.8, 1.8, (1, 5, 6, 7, 81)),
                       jnp.float32)
    w3 = jnp.asarray(rng.randn(3, 3, 3, 4, 4) * 0.1, jnp.float32)
    ref = ops.deform_conv3d_gather(x3, off3, w3, None, stride=1,
                                   padding=1, dilation=1, groups=1)
    out = ops.deform_conv3d(x3, off3, w3, None, stride=1, padding=1,
                            dilation=1, groups=1)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    x2 = jnp.asarray(rng.randn(1, 9, 10, 4), jnp.float32)
    off2 = jnp.asarray(rng.uniform(-1.8, 1.8, (1, 9, 10, 50)),
                       jnp.float32)
    w2 = jnp.asarray(rng.randn(5, 5, 1, 4) * 0.1, jnp.float32)
    ref2 = ops.deform_conv2d_gather(x2, off2, w2, None, stride=1,
                                    padding=2, dilation=1, groups=4)
    out2 = ops.deform_conv2d(x2, off2, w2, None, stride=1, padding=2,
                             dilation=1, groups=4)
    np.testing.assert_allclose(out2, ref2, atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_window_grad_flows():
    """The window path must be differentiable (training uses it)."""
    from deformablelka_tpu.ops.deform3d import deform_conv3d_window

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 4, 4, 4, 2), jnp.float32)
    off = jnp.asarray(rng.uniform(-1, 1, (1, 4, 4, 4, 81)), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 2, 2) * 0.1, jnp.float32)

    def loss(x, off, w):
        return jnp.sum(deform_conv3d_window(
            x, off, w, None, stride=1, padding=1, dilation=1,
            groups=1, radius=1) ** 2)

    gx, goff, gw = jax.grad(loss, argnums=(0, 1, 2))(x, off, w)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(np.asarray(goff)).all()
    assert float(jnp.abs(goff).max()) > 0
    assert np.isfinite(np.asarray(gw)).all()


def test_conv3d_im2col_parity():
    """The im2col 3³ conv path must equal lax.conv exactly."""
    import os
    from deformablelka_tpu.ops import conv3d

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 5, 6, 7, 4), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 4, 6) * 0.3, jnp.float32)
    b = jnp.asarray(rng.randn(6), jnp.float32)
    a = conv3d(x, w, padding=1, bias=b)  # im2col default
    os.environ["DLKA_CONV_IMPL"] = "lax"
    try:
        ref = conv3d(x, w, padding=1, bias=b)
    finally:
        os.environ.pop("DLKA_CONV_IMPL")
    np.testing.assert_allclose(a, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_pallas_deform_interpret_parity_and_grad():
    """Pallas kernel (interpret mode) vs gather reference + VJP check."""
    from deformablelka_tpu.ops.pallas.deform3d_kernel import (
        deform_conv3d_pallas)
    from deformablelka_tpu.ops import deform_conv3d_gather

    rng = np.random.RandomState(0)
    for (B, D, H, W, C) in ((1, 4, 6, 8, 4), (2, 4, 4, 4, 2),
                            (1, 8, 32, 16, 4)):
        x = jnp.asarray(rng.randn(B, D, H, W, C), jnp.float32)
        off = jnp.asarray(rng.uniform(-1.5, 1.5, (B, D, H, W, 81)),
                          jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 3, C, C) * 0.1, jnp.float32)
        ref = deform_conv3d_gather(x, off, w, None, stride=1, padding=1,
                                   dilation=1, groups=1)
        out = deform_conv3d_pallas(x, off, w, 2, True)
        np.testing.assert_allclose(out, ref, atol=5e-5, rtol=5e-5)

    def loss(x, off, w):
        return jnp.sum(deform_conv3d_pallas(x, off, w, 1, True) ** 2)

    x = jnp.asarray(rng.randn(1, 4, 4, 4, 2), jnp.float32)
    off = jnp.asarray(rng.uniform(-0.9, 0.9, (1, 4, 4, 4, 81)),
                      jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 2, 2) * 0.1, jnp.float32)
    gx, goff, gw = jax.grad(loss, argnums=(0, 1, 2))(x, off, w)
    for g in (gx, goff, gw):
        assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(goff).max()) > 0


def test_pallas_deform_v3_interpret_parity():
    """The v3/v4 kernels (tap-inner grid + in-kernel dot — the hybrid
    fast branch at R=1, C<=32; v4 factors the hat weights full-width)
    vs the gather reference in interpret mode. Sub-voxel offsets, so
    the R=1 clip is lossless and parity is exact sampling semantics,
    not approximation."""
    from deformablelka_tpu.ops.pallas.deform3d_kernel import (
        _forward_v3, _forward_v4, _forward_v5, _forward_v5x,
        _kernel_version)
    from deformablelka_tpu.ops import deform_conv3d_gather

    # default since round 5 (second attempt): v5x/v5xw with the
    # scoped-VMEM limit raised (DLKA_PALLAS_VMEM_LIMIT_MB=32 for the
    # in-place variants) so the call fits the while-nested
    # sliding-window scan program that broke the round-4 flip.
    # Gated on a full same-session bench.py run: 0.2459 vol/s vs
    # 0.2358 for v4 (PERF.md round-5 entry). auto4 pins v4/v4w.
    assert _kernel_version(1, 32) == "v5x"
    assert _kernel_version(2, 32) == "v2"
    assert _kernel_version(1, 64) == "v5xw"
    assert _kernel_version(1, 128) == "v5xw"
    assert _kernel_version(1, 256) == "v2"
    import os as _os
    _os.environ["DLKA_PALLAS_KERNEL"] = "auto4"
    try:
        assert _kernel_version(1, 32) == "v4"
        assert _kernel_version(1, 64) == "v4w"
    finally:
        del _os.environ["DLKA_PALLAS_KERNEL"]

    rng = np.random.RandomState(0)
    for (B, D, H, W, C) in ((1, 4, 6, 8, 4), (2, 8, 16, 8, 8)):
        x = jnp.asarray(rng.randn(B, D, H, W, C), jnp.float32)
        off = jnp.asarray(rng.uniform(-0.9, 0.9, (B, D, H, W, 81)),
                          jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 3, C, C) * 0.1, jnp.float32)
        ref = deform_conv3d_gather(x, off, w, None, stride=1, padding=1,
                                   dilation=1, groups=1)
        for fwd in (_forward_v3, _forward_v4, _forward_v5,
                    _forward_v5x):
            out = fwd(x, off, w, 1, True)
            np.testing.assert_allclose(out, ref, atol=5e-5, rtol=5e-5)


def test_pallas_deform_v4w_interpret_parity():
    """The v4w kernel (multi-pack x-window for C>32 — the hybrid fast
    branch at stages 1-2: 16^3 C64 / 8^3 C128) vs the gather reference
    in interpret mode, at C values forcing n_packs=2 and 3."""
    from deformablelka_tpu.ops.pallas.deform3d_kernel import (
        _forward_v4w, _forward_v5w, _forward_v5xw)
    from deformablelka_tpu.ops import deform_conv3d_gather

    rng = np.random.RandomState(1)
    for (B, D, H, W, C) in ((1, 4, 8, 8, 64), (1, 4, 4, 8, 128)):
        x = jnp.asarray(rng.randn(B, D, H, W, C), jnp.float32)
        off = jnp.asarray(rng.uniform(-0.9, 0.9, (B, D, H, W, 81)),
                          jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 3, C, C) * 0.05, jnp.float32)
        ref = deform_conv3d_gather(x, off, w, None, stride=1, padding=1,
                                   dilation=1, groups=1)
        for fwd in (_forward_v4w, _forward_v5w, _forward_v5xw):
            out = fwd(x, off, w, 1, True)
            np.testing.assert_allclose(out, ref, atol=5e-4, rtol=5e-4)


def test_pallas_bwd_interpret_parity():
    """The pallas backward kernel (deform3d_bwd_kernel: VMEM-resident
    dx canvas + per-tap MXU dots) vs the XLA scatter-free VJP
    (_window_core_bwd), interpret mode. Offsets beyond ±1 exercise the
    clip straight-through mask."""
    from deformablelka_tpu.ops.deform3d import deform_conv3d_window
    from deformablelka_tpu.ops.pallas.deform3d_bwd_kernel import (
        deform_conv3d_window_bwd_pallas)

    rng = np.random.RandomState(0)
    for (B, D, H, W, C) in ((1, 4, 8, 8, 8), (2, 8, 16, 8, 4)):
        x = jnp.asarray(rng.randn(B, D, H, W, C), jnp.float32)
        off = jnp.asarray(rng.uniform(-1.5, 1.5, (B, D, H, W, 81)),
                          jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 3, C, C) * 0.1, jnp.float32)
        g = jnp.asarray(rng.randn(B, D, H, W, C), jnp.float32)

        def f(x, off, w):
            return deform_conv3d_window(x, off, w, None, stride=1,
                                        padding=1, dilation=1,
                                        groups=1, radius=1)

        _, vjp = jax.vjp(f, x, off, w)
        dx_ref, doff_ref, dw_ref = vjp(g)
        dx, doff, dw = deform_conv3d_window_bwd_pallas(
            x, off, w, g, interpret=True)
        doff = jnp.where(jnp.abs(off) <= 1.0, doff, 0.0)
        np.testing.assert_allclose(dx, dx_ref, atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(doff, doff_ref, atol=2e-5,
                                   rtol=2e-5)
        np.testing.assert_allclose(dw, dw_ref, atol=2e-4, rtol=2e-4)


def test_pallas_bwd_dispatch(monkeypatch):
    """DLKA_DEFORM_BWD=pallas routes _window_core's VJP through the
    pallas backward (interpret-safe shapes fall back on CPU — the
    dispatch itself is exercised via bwd_supported eligibility)."""
    from deformablelka_tpu.ops.pallas.deform3d_bwd_kernel import (
        bwd_supported)

    assert bwd_supported(3, 3, 3, 1, 1, 1, 1, 32, 32,
                         spatial=(32, 64, 64))
    assert not bwd_supported(3, 3, 3, 1, 1, 1, 2, 32, 32)   # groups
    assert not bwd_supported(5, 5, 5, 1, 1, 1, 1, 32, 32)   # kernel
    assert not bwd_supported(3, 3, 3, 2, 1, 1, 1, 32, 32)   # stride
    assert not bwd_supported(3, 3, 3, 1, 0, 1, 1, 32, 32)   # padding
    assert not bwd_supported(3, 3, 3, 1, 1, 1, 1, 256, 256)  # C
    assert not bwd_supported(3, 3, 3, 1, 1, 1, 1, 32, 64)   # cin!=cout


def test_slab_vs_taa_gather_parity(monkeypatch):
    """The slab (one lax.gather of (2,2,2,C) per tap) and the 8-row
    take_along_axis samplers must agree exactly, fwd + grads, incl. for
    far-out-of-range offsets (PERF.md: slab is the faster default)."""
    import deformablelka_tpu.ops.deform2d as d2
    import deformablelka_tpu.ops.deform3d as d3

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 5, 6, 4, 3), jnp.float32)
    off = jnp.asarray(rng.randn(2, 5, 6, 4, 81) * 4, jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 3, 3) * 0.2, jnp.float32)

    def f3(x, off, w):
        return d3.deform_conv3d(x, off, w, stride=1, padding=1,
                                dilation=1, groups=1)

    monkeypatch.setenv("DLKA_GATHER_IMPL", "taa")
    ref, vjp_ref = jax.vjp(f3, x, off, w)
    g = jnp.asarray(rng.randn(*ref.shape), jnp.float32)
    grads_ref = vjp_ref(g)
    monkeypatch.setenv("DLKA_GATHER_IMPL", "slab")
    got, vjp_got = jax.vjp(f3, x, off, w)
    np.testing.assert_allclose(got, ref, atol=1e-5)
    for a, b in zip(grads_ref, vjp_got(g)):
        np.testing.assert_allclose(b, a, atol=1e-5)

    x2 = jnp.asarray(rng.randn(1, 9, 8, 5), jnp.float32)
    off2 = jnp.asarray(rng.randn(1, 9, 8, 50) * 3, jnp.float32)
    w2 = jnp.asarray(rng.randn(5, 5, 1, 5) * 0.2, jnp.float32)

    def f2(x, off, w):
        return d2.deform_conv2d(x, off, w, stride=1, padding=2,
                                dilation=1, groups=5)

    monkeypatch.setenv("DLKA_GATHER_IMPL", "taa")
    ref2 = f2(x2, off2, w2)
    monkeypatch.setenv("DLKA_GATHER_IMPL", "slab")
    np.testing.assert_allclose(f2(x2, off2, w2), ref2, atol=1e-5)


def test_atrous_dilated_depthwise_parity():
    """À trous (space-to-batch) dilated depthwise conv is bit-exact vs
    the lax dilated emitter, incl. axes not divisible by the dilation."""
    from deformablelka_tpu.ops.convs import (_depthwise3d_atrous,
                                             depthwise_conv3d)
    rng = np.random.RandomState(0)
    for (D, H, W, C, k, d) in ((10, 11, 13, 8, 7, 3), (9, 15, 10, 16, 5, 3),
                               (12, 12, 12, 4, 3, 2)):
        x = jnp.asarray(rng.randn(2, D, H, W, C), jnp.float32)
        w = jnp.asarray(rng.randn(k, k, k, 1, C), jnp.float32)
        ref = depthwise_conv3d(x, w, dilation=d)
        got = _depthwise3d_atrous(x, w, d, None)
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-5)


def test_dwconv3d_pallas_interpret_parity():
    """ops/pallas/dwconv3d_kernel: exact-f32 depthwise stencil (direct
    dense path + a-trous phase split for dilation) vs the lax emitter
    on CPU. On-device the lax DEFAULT-precision emitter is bf16-ish at
    some shapes (PERF.md 2026-08-17) — this kernel is the exact-f32
    reference formulation."""
    from deformablelka_tpu.ops.pallas.dwconv3d_kernel import (
        depthwise_conv3d_pallas)
    from deformablelka_tpu.ops.convs import depthwise_conv3d

    rng = np.random.RandomState(0)
    for (sp, C, K, dil) in [((8, 16, 16), 32, 5, 1),
                            ((8, 16, 16), 32, 7, 3),
                            ((4, 8, 8), 256, 3, 1),
                            ((10, 14, 22), 8, 7, 3)]:
        x = jnp.asarray(rng.randn(2, *sp, C), jnp.float32)
        w = jnp.asarray(rng.randn(K, K, K, 1, C), jnp.float32)
        y1 = depthwise_conv3d_pallas(x, w, K, dil, True)
        y2 = depthwise_conv3d(x, w, padding=(K // 2) * dil, dilation=dil)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   atol=2e-4)
        # grad path (delegated XLA VJP) must flow
        g = jax.grad(lambda x: jnp.sum(
            depthwise_conv3d_pallas(x, w, K, dil, True) ** 2))(x[:1])
        assert np.isfinite(np.asarray(g)).all()


def test_deform2d_pallas_interpret_parity_and_grad():
    """ops/pallas/deform2d_kernel: dense-window depthwise deformable 2D
    conv vs the numpy loop reference (exact for |offset| <= R), plus
    grad flow through the delegated window VJP."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from references import deform_conv2d_ref
    from deformablelka_tpu.ops.pallas.deform2d_kernel import (
        deform_dw_conv2d_pallas)

    rng = np.random.RandomState(0)
    for (H, W, C, kk, dil, R) in [(16, 16, 96, 5, 1, 2),
                                  (8, 8, 256, 7, 3, 1)]:
        x = rng.randn(1, H, W, C).astype(np.float32)
        off = (rng.rand(1, H, W, 2 * kk * kk).astype(np.float32) * 2
               - 1) * R
        w = rng.randn(kk, kk, 1, C).astype(np.float32)
        y = deform_dw_conv2d_pallas(jnp.asarray(x), jnp.asarray(off),
                                    jnp.asarray(w), R, dil, True)
        ref = deform_conv2d_ref(x, off, w, None, 1, (kk // 2) * dil,
                                dil, C)
        np.testing.assert_allclose(np.asarray(y), ref, atol=2e-4)

    g = jax.grad(lambda x, off, w: jnp.sum(deform_dw_conv2d_pallas(
        x, off, w, 1, 1, True) ** 2), argnums=(0, 1, 2))(
        jnp.asarray(x[..., :32]), jnp.asarray(off[:, :, :, :50]),
        jnp.asarray(w[:5, :5, :, :32][:, :, :, :]))
    for t in g:
        assert np.isfinite(np.asarray(t)).all()


def test_hybrid_dispatch_exact_both_branches(monkeypatch):
    """DLKA_DEFORM_IMPL=hybrid must be reference-exact whichever branch
    the traced lax.cond takes: window/pallas when max|off| <= R, gather
    beyond."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from references import deform_conv3d_ref
    from deformablelka_tpu import ops as dops

    monkeypatch.setenv("DLKA_DEFORM_IMPL", "hybrid")
    rng = np.random.RandomState(0)
    x = rng.randn(1, 6, 8, 8, 8).astype(np.float32)
    w = rng.randn(3, 3, 3, 8, 8).astype(np.float32)
    for scale in (0.5, 3.0):   # fast branch / gather fallback
        off = (rng.rand(1, 6, 8, 8, 81).astype(np.float32) * 2 - 1) * scale
        ref = deform_conv3d_ref(x, off, w, None, 1, 1)
        y = dops.deform_conv3d(jnp.asarray(x), jnp.asarray(off),
                               jnp.asarray(w), None, stride=1, padding=1)
        np.testing.assert_allclose(np.asarray(y), ref, atol=2e-4)
    g = jax.grad(lambda x, o: jnp.sum(dops.deform_conv3d(
        x, o, jnp.asarray(w), None, stride=1, padding=1) ** 2),
        argnums=(0, 1))(jnp.asarray(x), jnp.asarray(off * 0.1))
    for t in g:
        assert np.isfinite(np.asarray(t)).all()


# ---------------------------------------------------------------------------
# Custom scatter-free window VJPs vs XLA autodiff of the same forward
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "depthwise,radius,pad,dil,k",
    [(True, 1, 1, 1, 3),
     # R=2 windows are (2R+1)^3=125-term — ~90 s each on 1 CPU → slow
     pytest.param(True, 2, 2, 3, 5, marks=pytest.mark.slow),
     (False, 1, 1, 1, 3),
     pytest.param(False, 2, 2, 2, 3, marks=pytest.mark.slow)])
def test_window3d_custom_vjp_matches_autodiff(depthwise, radius, pad,
                                              dil, k):
    """deform3d._window_core_bwd (explicit per-tap-recompute VJP — the
    path that keeps the TPU compiler from drowning in scan residuals,
    see its docstring) must equal XLA autodiff of the identical forward
    to fp32 precision, including clipped-offset zeroing."""
    from deformablelka_tpu.ops import deform3d as d3
    rng = np.random.RandomState(0)
    B, D, H, W, C = 2, 5, 6, 7, 4
    g = C if depthwise else 2
    cout = C if depthwise else 6
    cin_g = 1 if depthwise else C // g
    x = jnp.asarray(rng.randn(B, D, H, W, C), jnp.float32)
    K = k ** 3
    off = jnp.asarray(rng.randn(B, D, H, W, 3 * K) * radius * 1.2,
                      jnp.float32)  # some offsets beyond the clip
    w = jnp.asarray(rng.randn(k, k, k, cin_g, cout), jnp.float32)
    gr = jnp.asarray(rng.randn(B, D, H, W, cout), jnp.float32)

    def f_custom(x, off, w):
        return jnp.sum(d3.deform_conv3d_window(
            x, off, w, None, padding=pad, dilation=dil, groups=g,
            radius=radius) * gr)

    def f_auto(x, off, w):
        return jnp.sum(d3._window_impl(
            x, off, w, (1, 1, 1), (pad,) * 3, (dil,) * 3, g,
            radius) * gr)

    gc = jax.grad(f_custom, argnums=(0, 1, 2))(x, off, w)
    ga = jax.grad(f_auto, argnums=(0, 1, 2))(x, off, w)
    for name, a, b in zip(("dx", "doff", "dw"), gc, ga):
        scale = max(float(jnp.max(jnp.abs(b))), 1.0)
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4 * scale, name


@pytest.mark.parametrize("depthwise,radius,pad,dil,k",
                         [(True, 1, 1, 1, 3), (True, 2, 9, 3, 7),
                          (False, 1, 1, 1, 3)])
def test_window2d_custom_vjp_matches_autodiff(depthwise, radius, pad,
                                              dil, k):
    """2D analog (deform2d._window2d_core_bwd), incl. the reference's
    7×7 dilation-3 LKA geometry."""
    from deformablelka_tpu.ops import deform2d as d2
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 12, 11, 4
    g = C if depthwise else 2
    cout = C if depthwise else 6
    cin_g = 1 if depthwise else C // g
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    K = k * k
    off = jnp.asarray(rng.randn(B, H, W, 2 * K) * radius * 1.2,
                      jnp.float32)
    w = jnp.asarray(rng.randn(k, k, cin_g, cout), jnp.float32)
    gr = jnp.asarray(rng.randn(B, H, W, cout), jnp.float32)

    def f_custom(x, off, w):
        return jnp.sum(d2.deform_conv2d_window(
            x, off, w, None, padding=pad, dilation=dil, groups=g,
            radius=radius) * gr)

    def f_auto(x, off, w):
        return jnp.sum(d2._window2d_impl(
            x, off, w, (1, 1), (pad,) * 2, (dil,) * 2, g, radius) * gr)

    gc = jax.grad(f_custom, argnums=(0, 1, 2))(x, off, w)
    ga = jax.grad(f_auto, argnums=(0, 1, 2))(x, off, w)
    for name, a, b in zip(("dx", "doff", "dw"), gc, ga):
        scale = max(float(jnp.max(jnp.abs(b))), 1.0)
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4 * scale, name


def test_lka_fused_interpret_parity():
    """ops/pallas/lka_fused_kernel: the fused dw5→dw7d3→1×1 gate chain
    (both depthwise stages in ONE pallas_call) vs ops.lka on CPU
    (interpret mode), forward + grad, 2D and 3D."""
    from deformablelka_tpu.ops.pallas.lka_fused_kernel import (
        lka2d_fused, lka3d_fused)
    from deformablelka_tpu.ops.lka import lka2d, lka3d

    rng = np.random.RandomState(3)
    C = 3
    b5 = jnp.asarray(rng.randn(C), jnp.float32)
    b7 = jnp.asarray(rng.randn(C), jnp.float32)
    bp = jnp.asarray(rng.randn(C), jnp.float32)

    x = jnp.asarray(rng.randn(1, 4, 5, 6, C), jnp.float32)
    w5 = jnp.asarray(rng.randn(5, 5, 5, 1, C), jnp.float32) * 0.2
    w7 = jnp.asarray(rng.randn(7, 7, 7, 1, C), jnp.float32) * 0.1
    wp = jnp.asarray(rng.randn(1, 1, 1, C, C), jnp.float32) * 0.3
    y_ref = lka3d(x, w5, b5, w7, b7, wp, bp)
    y_f = lka3d_fused(x, w5, b5, w7, b7, wp, bp, True)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               atol=1e-4)
    g_f = jax.grad(lambda x: jnp.sum(
        lka3d_fused(x, w5, b5, w7, b7, wp, bp, True) ** 2))(x)
    g_r = jax.grad(lambda x: jnp.sum(
        lka3d(x, w5, b5, w7, b7, wp, bp) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r),
                               atol=1e-3)

    x2 = jnp.asarray(rng.randn(2, 6, 7, C), jnp.float32)
    w52 = jnp.asarray(rng.randn(5, 5, 1, C), jnp.float32) * 0.2
    w72 = jnp.asarray(rng.randn(7, 7, 1, C), jnp.float32) * 0.1
    wp2 = jnp.asarray(rng.randn(1, 1, C, C), jnp.float32) * 0.3
    y2_ref = lka2d(x2, w52, b5, w72, b7, wp2, bp)
    y2_f = lka2d_fused(x2, w52, b5, w72, b7, wp2, bp, True)
    np.testing.assert_allclose(np.asarray(y2_f), np.asarray(y2_ref),
                               atol=1e-4)


def test_lka_fused_module_dispatch(monkeypatch):
    """DLKA_LKA_IMPL=fused routes the nn LKA gates through the fused
    kernel with an IDENTICAL param tree (as_params conv reuse); outputs
    match the default chain. DLKA_LKA_INTERPRET=1 exercises the real
    dispatch path on CPU."""
    from deformablelka_tpu.nn.blocks3d import LKA3d
    from deformablelka_tpu.nn.lka2d import AttentionModule

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 4, 5, 6, 4), jnp.float32)
    m = LKA3d()
    v = m.init(rng, x)
    y_chain = m.apply(v, x)

    monkeypatch.setenv("DLKA_LKA_IMPL", "fused")
    monkeypatch.setenv("DLKA_LKA_INTERPRET", "1")
    v_f = m.init(rng, x)
    assert jax.tree_util.tree_structure(v_f) == \
        jax.tree_util.tree_structure(v)
    y_fused = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_chain),
                               atol=1e-5)

    x2 = jax.random.normal(rng, (1, 6, 7, 4), jnp.float32)
    m2 = AttentionModule()
    monkeypatch.delenv("DLKA_LKA_IMPL")
    v2 = m2.init(rng, x2)
    y2_chain = m2.apply(v2, x2)
    monkeypatch.setenv("DLKA_LKA_IMPL", "fused")
    y2_fused = m2.apply(v2, x2)
    np.testing.assert_allclose(np.asarray(y2_fused),
                               np.asarray(y2_chain), atol=1e-5)


def test_hybrid_residual_form_2d_exact():
    """DLKA_HYBRID_FORM_2D=residual (opt-in; lost the model gate but
    kept for the record) matches the gather reference on BOTH offset
    regimes: |off|<=R takes the zero-correction path (bit-equal to the
    window fast branch), |off|>R applies the f32 correction."""
    import os
    from deformablelka_tpu.ops import deform_conv2d, deform_conv2d_gather

    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(1, 10, 12, 8), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 1, 8) * 0.1, jnp.float32)
    os.environ["DLKA_HYBRID_FORM_2D"] = "residual"
    try:
        for scale in (0.3, 2.5):
            off = jnp.asarray(rs.randn(1, 10, 12, 18) * scale,
                              jnp.float32)
            ref = deform_conv2d_gather(x, off, w, None, stride=1,
                                       padding=1, groups=8)
            out = deform_conv2d(x, off, w, None, stride=1, padding=1,
                                groups=8)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-5)
    finally:
        del os.environ["DLKA_HYBRID_FORM_2D"]
