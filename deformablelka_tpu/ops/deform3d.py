"""3D deformable convolution (reference `D3D` CUDA-extension semantics).

Reference behaviour reproduced (re-derived, not copied):
  /root/reference/3D/dcn/src/cuda/deform_im2col_cuda.cuh:192-265 — the
  deformable im2col builds a column matrix by sampling, per tap k of the
  kd*kh*kw window, the position (d_in + i*dil + Δd, h_in + j*dil + Δh,
  w_in + k*dil + Δw) with trilinear interpolation and zero outside; the
  offset tensor has deformable_groups * 3 * K channels ordered
  (Δd, Δh, Δw) per tap, taps row-major over (kd, kh, kw)
  (deform_im2col_cuda.cuh:238-247, asserted at deform_conv.py:53-54).
  The conv itself is then a grouped GEMM over the columns
  (deform_conv_cuda.cu:18-126).

TPU-first design: trilinear gather = 8 aligned row-gathers over the
flattened (D*H*W, C) volume + FMA; the grouped GEMM runs on the MXU via
einsum. `DeformConvPack` (deform_conv.py:67-105) predicts offsets with a
zero-initialised Conv3d — identity sampling at init — which lives in the
module layer, not here.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

from deformablelka_tpu.ops.convs import _tuple


def _trilinear_gather(x_flat, D, H, W, zs, ys, xs, compute_dtype):
    """Sample (B, D*H*W, C) at fractional (z, y, x); zero outside.

    zs/ys/xs: (B, P). Returns (B, P, C). One tap at a time — the caller
    loops over kernel taps so no (B, P, K, C) im2col tensor is ever
    materialised (HBM-friendly; the K axis would also pad badly on the
    128-lane minor dimension).
    """
    B, _, C = x_flat.shape
    z0 = jnp.floor(zs)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    dz = (zs - z0).astype(compute_dtype)[..., None]
    dy = (ys - y0).astype(compute_dtype)[..., None]
    dx = (xs - x0).astype(compute_dtype)[..., None]
    z0i = z0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    out = None
    for oz in (0, 1):
        for oy in (0, 1):
            for ox in (0, 1):
                zi = z0i + oz
                yi = y0i + oy
                xi = x0i + ox
                valid = ((zi >= 0) & (zi < D) & (yi >= 0) & (yi < H)
                         & (xi >= 0) & (xi < W))
                lin = ((jnp.clip(zi, 0, D - 1) * H + jnp.clip(yi, 0, H - 1)) * W
                       + jnp.clip(xi, 0, W - 1))
                g = jnp.take_along_axis(x_flat, lin[..., None], axis=1)
                wz = dz if oz else (1.0 - dz)
                wy = dy if oy else (1.0 - dy)
                wx = dx if ox else (1.0 - dx)
                w = (wz * wy * wx) * valid[..., None].astype(compute_dtype)
                contrib = g * w
                out = contrib if out is None else out + contrib
    return out


def _trilinear_gather_slab(xpad, D, H, W, zs, ys, xs, compute_dtype):
    """Slab variant of `_trilinear_gather`: ONE `lax.gather` per tap
    fetching the (2, 2, 2, C) corner slab, instead of 8 row gathers.

    Same bytes from HBM, 8× fewer gather ops and index computations —
    measured 81 → 72 ms at the flagship stage-1 shape (PERF.md). Exact:
    `xpad` carries a 1-voxel zero ring, so corner values of any sample
    with z0 ∈ [-1, D-1] (resp. y0/x0) land either on real voxels or the
    zero ring; far-out samples are killed by the validity mask exactly
    as in the 8-gather version. Indices are clipped into the padded
    volume before the gather, so PROMISE_IN_BOUNDS is safe.

    xpad: (B, D+2, H+2, W+2, C) zero-padded volume; zs/ys/xs: (B, P).
    Returns (B, P, C).
    """
    C = xpad.shape[-1]
    z0 = jnp.floor(zs)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    dz = (zs - z0).astype(compute_dtype)[..., None]
    dy = (ys - y0).astype(compute_dtype)[..., None]
    dx = (xs - x0).astype(compute_dtype)[..., None]
    z0i = z0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    idx = jnp.stack([jnp.clip(z0i, -1, D - 1) + 1,
                     jnp.clip(y0i, -1, H - 1) + 1,
                     jnp.clip(x0i, -1, W - 1) + 1], axis=-1)
    dn = lax.GatherDimensionNumbers(offset_dims=(1, 2, 3, 4),
                                    collapsed_slice_dims=(),
                                    start_index_map=(0, 1, 2))
    g = jax.vmap(lambda xp, ix: lax.gather(
        xp, ix, dn, slice_sizes=(2, 2, 2, C),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS))(xpad, idx)
    out = None
    for oz in (0, 1):
        wz = dz if oz else (1.0 - dz)
        vz = (z0i + oz >= 0) & (z0i + oz < D)
        for oy in (0, 1):
            wy = dy if oy else (1.0 - dy)
            vy = (y0i + oy >= 0) & (y0i + oy < H)
            for ox in (0, 1):
                wx = dx if ox else (1.0 - dx)
                vx = (x0i + ox >= 0) & (x0i + ox < W)
                wgt = (wz * wy * wx) * (vz & vy & vx)[..., None].astype(
                    compute_dtype)
                contrib = g[:, :, oz, oy, ox, :] * wgt
                out = contrib if out is None else out + contrib
    return out


def deform_conv3d(x, offset, w, bias=None, *, stride=1, padding=0, dilation=1,
                  groups: int = 1):
    """Deformable 3D convolution (D3D semantics), tap-streaming.

    Args:
      x: (B, D, H, W, Cin).
      offset: (B, Do, Ho, Wo, 3*kd*kh*kw) — (Δd, Δh, Δw) per tap,
        taps row-major over (kd, kh, kw).
      w: (kd, kh, kw, Cin // groups, Cout).
    Returns:
      (B, Do, Ho, Wo, Cout).

    The kernel-tap loop is unrolled in the XLA program; each tap performs
    a trilinear gather (B, P, C) and a per-group contraction on the MXU,
    accumulating into the output. Peak memory is O(B·P·C), not O(B·P·K·C).
    """
    kd, kh, kw, cin_g, cout = w.shape
    B, D, H, W, C = x.shape
    sd, sh, sw = _tuple(stride, 3)
    pd, ph, pw = _tuple(padding, 3)
    dd, dh, dw = _tuple(dilation, 3)
    K = kd * kh * kw
    Do = (D + 2 * pd - dd * (kd - 1) - 1) // sd + 1
    Ho = (H + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    Wo = (W + 2 * pw - dw * (kw - 1) - 1) // sw + 1
    assert offset.shape == (B, Do, Ho, Wo, 3 * K)

    compute_dtype = x.dtype
    P = Do * Ho * Wo
    od = jnp.arange(Do, dtype=jnp.float32) * sd - pd
    oh = jnp.arange(Ho, dtype=jnp.float32) * sh - ph
    ow = jnp.arange(Wo, dtype=jnp.float32) * sw - pw
    base_z = jnp.broadcast_to(od[:, None, None], (Do, Ho, Wo)).reshape(1, P)
    base_y = jnp.broadcast_to(oh[None, :, None], (Do, Ho, Wo)).reshape(1, P)
    base_x = jnp.broadcast_to(ow[None, None, :], (Do, Ho, Wo)).reshape(1, P)
    off = offset.reshape(B, P, K, 3).astype(jnp.float32)
    off_k = jnp.moveaxis(off, 2, 0)  # (K, B, P, 3)

    # per-tap static base offsets (K, 3)
    taps = jnp.asarray(
        [[i * dd, j * dh, m * dw] for i in range(kd) for j in range(kh)
         for m in range(kw)], jnp.float32)

    slab = os.environ.get("DLKA_GATHER_IMPL", "slab") == "slab"
    if slab:
        x_src = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    else:
        x_src = x.reshape(B, D * H * W, C)
    depthwise = groups == C and cin_g == 1 and cout == C
    cpg = C // groups
    opg = cout // groups
    if depthwise:
        w_k = w.reshape(K, C)  # (K, C)
    else:
        # (K, cpg, cout) → (K, groups, cpg, opg)
        w_k = w.reshape(K, cpg, groups, opg).transpose(0, 2, 1, 3)

    sampler = _trilinear_gather_slab if slab else _trilinear_gather

    def body(acc, xs):
        off_t, tap, wt = xs
        zs = base_z + tap[0] + off_t[..., 0]
        ys = base_y + tap[1] + off_t[..., 1]
        xs_ = base_x + tap[2] + off_t[..., 2]
        samp = sampler(x_src, D, H, W, zs, ys, xs_,
                       compute_dtype)  # (B, P, C)
        if depthwise:
            contrib = samp * wt.astype(compute_dtype)
        else:
            sg = samp.reshape(B, P, groups, cpg)
            contrib = jnp.einsum("bpgc,gco->bpgo", sg,
                                 wt.astype(compute_dtype)).reshape(
                B, P, cout)
        return acc + contrib, None

    init = jnp.zeros((B, P, cout), compute_dtype)
    out, _ = jax.lax.scan(body, init, (off_k, taps, w_k))
    out = out.reshape(B, Do, Ho, Wo, cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def deform_sample3d(x, offset, kernel_size, *, stride=1, padding=0,
                    dilation=1):
    """Deformable im2col (B, Do, Ho, Wo, K, C) — reference/debug path; the
    conv itself streams taps and never builds this tensor."""
    B, D, H, W, C = x.shape
    kd, kh, kw = _tuple(kernel_size, 3)
    K = kd * kh * kw
    sd, sh, sw = _tuple(stride, 3)
    pd, ph, pw = _tuple(padding, 3)
    dd, dh, dw = _tuple(dilation, 3)
    Do = (D + 2 * pd - dd * (kd - 1) - 1) // sd + 1
    Ho = (H + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    Wo = (W + 2 * pw - dw * (kw - 1) - 1) // sw + 1
    P = Do * Ho * Wo
    od = jnp.arange(Do, dtype=jnp.float32) * sd - pd
    oh = jnp.arange(Ho, dtype=jnp.float32) * sh - ph
    ow = jnp.arange(Wo, dtype=jnp.float32) * sw - pw
    base_z = jnp.broadcast_to(od[:, None, None], (Do, Ho, Wo)).reshape(1, P)
    base_y = jnp.broadcast_to(oh[None, :, None], (Do, Ho, Wo)).reshape(1, P)
    base_x = jnp.broadcast_to(ow[None, None, :], (Do, Ho, Wo)).reshape(1, P)
    off = offset.reshape(B, P, K, 3).astype(jnp.float32)
    x_flat = x.reshape(B, D * H * W, C)
    cols = []
    for i in range(kd):
        for j in range(kh):
            for m in range(kw):
                k = (i * kh + j) * kw + m
                zs = base_z + i * dd + off[:, :, k, 0]
                ys = base_y + j * dh + off[:, :, k, 1]
                xs = base_x + m * dw + off[:, :, k, 2]
                cols.append(_trilinear_gather(x_flat, D, H, W, zs, ys, xs,
                                              x.dtype))
    samp = jnp.stack(cols, axis=2)  # (B, P, K, C)
    return samp.reshape(B, Do, Ho, Wo, K, C)



# ---------------------------------------------------------------------------
# Dense-window deformable conv — the TPU-fast path (gather-free).
# ---------------------------------------------------------------------------

def _window_prep(x, w, stride, padding, dilation, groups, radius):
    """Shared geometry for the window forward/backward."""
    kd, kh, kw, cin_g, cout = w.shape
    B, D, H, W, C = x.shape
    sd, sh, sw = _tuple(stride, 3)
    assert sd == sh == sw == 1, "window path requires stride 1"
    pd, ph, pw = _tuple(padding, 3)
    dd, dh, dw = _tuple(dilation, 3)
    K = kd * kh * kw
    taps = jnp.asarray(
        [[i * dd - pd, j * dh - ph, m * dw - pw]
         for i in range(kd) for j in range(kh) for m in range(kw)],
        jnp.int32)
    depthwise = groups == C and cin_g == 1 and cout == C
    cpg = C // groups
    opg = cout // groups
    if depthwise:
        w_k = w.reshape(K, C)
    else:
        w_k = w.reshape(K, cpg, groups, opg).transpose(0, 2, 1, 3)
    base_min = min(-pd, -ph, -pw)
    base_max = max((kd - 1) * dd - pd, (kh - 1) * dh - ph,
                   (kw - 1) * dw - pw)
    lo = radius - base_min
    hi = radius + base_max
    return (K, taps, depthwise, cpg, opg, w_k, lo, hi)


def _hats(off_k, radius, compute_dtype):
    """Per-axis hat weights for every window offset: 3x(span,B,D,H,W)."""
    s_range = jnp.arange(-radius, radius + 1, dtype=compute_dtype)
    s = s_range[:, None, None, None, None]
    hz = jnp.maximum(0.0, 1.0 - jnp.abs(off_k[..., 0][None] - s))
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(off_k[..., 1][None] - s))
    hx = jnp.maximum(0.0, 1.0 - jnp.abs(off_k[..., 2][None] - s))
    return hz, hy, hx


def _window_impl(x, offset, w, stride, padding, dilation, groups, radius):
    """Forward body of deform_conv3d_window (no bias)."""
    kd, kh, kw, cin_g, cout = w.shape
    B, D, H, W, C = x.shape
    Do, Ho, Wo = D, H, W
    K, taps, depthwise, cpg, opg, w_k, lo, hi = _window_prep(
        x, w, stride, padding, dilation, groups, radius)
    assert offset.shape == (B, Do, Ho, Wo, 3 * K)

    compute_dtype = x.dtype
    # (K, B, D, H, W, 3), clipped to the exactness window
    off = jnp.moveaxis(
        offset.reshape(B, Do, Ho, Wo, K, 3), 4, 0).astype(compute_dtype)
    off = jnp.clip(off, -radius, radius)

    # pad once for the largest possible static shift:
    # tap base in [-p, (k-1)d-p], plus window span [-R, R]. The window
    # needs only s in [-R, R]: for clipped D in [-R, R] the hat
    # hat(D-s) = max(0, 1-|D-s|) is nonzero only for s in (D-1, D+1),
    # and at the boundary D = +-R the s = +-(R+1) corner has weight
    # exactly 0 (trilinear frac = 0). The previous [-(R+1), R+1] span
    # evaluated (2R+3)^3 terms where (2R+1)^3 carry all the mass -- a
    # 2.7x term reduction at R=2, 4.6x at R=1.
    xp = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (lo, hi), (0, 0)))

    span = 2 * radius + 1  # window offsets in [-R, R]

    def tap_body(acc, kt):
        off_k, tap, wt = kt
        hz, hy, hx = _hats(off_k, radius, compute_dtype)
        samp = jnp.zeros((B, Do, Ho, Wo, C), compute_dtype)
        for iz in range(span):
            for iy in range(span):
                for ix in range(span):
                    wgt = (hz[iz] * hy[iy] * hx[ix])[..., None]
                    # static slice of xp at shift tap + s (dynamic in
                    # tap only through lax.dynamic_slice on the padded
                    # array; tap is scan-carried data)
                    start = (0,
                             lo + tap[0] + iz - radius,
                             lo + tap[1] + iy - radius,
                             lo + tap[2] + ix - radius,
                             0)
                    xs = jax.lax.dynamic_slice(
                        xp, start, (B, Do, Ho, Wo, C))
                    samp = samp + wgt * xs
        if depthwise:
            contrib = samp * wt.astype(compute_dtype)
        else:
            sg = samp.reshape(B, Do * Ho * Wo, groups, cpg)
            contrib = jnp.einsum(
                "bpgc,gco->bpgo", sg, wt.astype(compute_dtype)).reshape(
                B, Do, Ho, Wo, cout)
        return acc + contrib, None

    init = jnp.zeros((B, Do, Ho, Wo, cout), compute_dtype)
    out, _ = jax.lax.scan(tap_body, init, (off, taps, w_k))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _window_core(x, offset, w, stride, padding, dilation, groups, radius):
    return _window_impl(x, offset, w, stride, padding, dilation, groups,
                        radius)


def _window_core_fwd(x, offset, w, stride, padding, dilation, groups,
                     radius):
    out = _window_impl(x, offset, w, stride, padding, dilation, groups,
                       radius)
    return out, (x, offset, w)


def _window_core_bwd(stride, padding, dilation, groups, radius, res, g):
    """Explicit scatter-free VJP with per-tap recomputation.

    Why not XLA autodiff: differentiating the scan forward stacks the
    per-tap hat weights and (2R+1)^3 window products as scan residuals,
    O(K * span^3 * B*D*H*W) bytes. At the flagship stage shape that is
    multi-GB and crashes the remote TPU compile helper (probed
    2026-08-17: grad of the single op HTTP-500s at 32x64x64xC64 while
    16x32x32xC32 compiles -- a residual-size cliff, not an op bug).
    Here the backward is its own scan that RECOMPUTES hats per tap
    (cheap VPU math) and carries only the padded dx accumulator:
      dw_k = sum_{b,p} g . samp_k            (samp_k recomputed)
      dOff_k = sum_c (g.w_k) . sum_s dhat/dOff . x(p+tap+s)
      dx   = sum_k sum_s hat . (g.w_k) shifted by -(tap+s)
    -- all dense slices/FMAs; the only "scatter" is a contiguous
    dynamic-update-slice read-modify-write on the padded accumulator,
    which XLA lowers to an in-place windowed add.
    """
    x, offset, w = res
    kd, kh, kw, cin_g, cout = w.shape
    B, D, H, W, C = x.shape
    # Pallas backward (DLKA_DEFORM_BWD=pallas): the same math with
    # the x-tile, g-tile, hats and the padded dx canvas VMEM-resident
    # per tile instead of 27×27 full-array HBM intermediates. Parity:
    # tests/test_deform_ops.py::test_pallas_bwd_*.
    import os as _os
    if _os.environ.get("DLKA_DEFORM_BWD", "xla") == "pallas":
        from deformablelka_tpu.ops.pallas.deform3d_bwd_kernel import (
            bwd_supported, deform_conv3d_window_bwd_pallas)
        if radius == 1 and bwd_supported(
                kd, kh, kw, stride, padding, dilation, groups, C,
                cout, spatial=(D, H, W)):
            dx, doff, dw = deform_conv3d_window_bwd_pallas(
                x, offset, w, g)
            doff = jnp.where(
                jnp.abs(offset.astype(jnp.float32)) <= radius,
                doff, 0.0).astype(offset.dtype)
            return dx, doff, dw
    Do, Ho, Wo = D, H, W
    K, taps, depthwise, cpg, opg, w_k, lo, hi = _window_prep(
        x, w, stride, padding, dilation, groups, radius)

    compute_dtype = x.dtype
    off_raw = jnp.moveaxis(
        offset.reshape(B, Do, Ho, Wo, K, 3), 4, 0).astype(compute_dtype)
    off = jnp.clip(off_raw, -radius, radius)

    xp = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (lo, hi), (0, 0)))
    span = 2 * radius + 1
    g = g.astype(compute_dtype)

    def tap_body(dxp, kt):
        off_k, tap, wt = kt
        hz, hy, hx = _hats(off_k, radius, compute_dtype)
        # dhat(D-s)/dD = -sign(D-s) where hat > 0 (0 at the kinks --
        # measure-zero for real-valued offsets)
        s_range = jnp.arange(-radius, radius + 1, dtype=compute_dtype)
        s = s_range[:, None, None, None, None]
        dhz = -jnp.sign(off_k[..., 0][None] - s) * (hz > 0)
        dhy = -jnp.sign(off_k[..., 1][None] - s) * (hy > 0)
        dhx = -jnp.sign(off_k[..., 2][None] - s) * (hx > 0)

        # dsamp(p, c) = dloss/dsamp_k(p, c)
        if depthwise:
            dsamp = g * wt.astype(compute_dtype)
        else:
            gg = g.reshape(B, Do * Ho * Wo, groups, opg)
            dsamp = jnp.einsum(
                "bpgo,gco->bpgc", gg, wt.astype(compute_dtype)).reshape(
                B, Do, Ho, Wo, C)

        samp = jnp.zeros((B, Do, Ho, Wo, C), compute_dtype)
        dz = jnp.zeros((B, Do, Ho, Wo), compute_dtype)
        dy = jnp.zeros((B, Do, Ho, Wo), compute_dtype)
        dxo = jnp.zeros((B, Do, Ho, Wo), compute_dtype)
        # dx push form, RMW-free inner loop: the original version did a
        # dynamic_slice + dynamic_update_slice of the full padded
        # accumulator PER WINDOW TERM — span³·K serialized full-array
        # HBM round-trips, measured at 972 ms for ONE stage-0
        # DeformConvPack3d grad (B=2 32³ C32; probe_train_bwd_r4,
        # 2026-08-19) vs 0.40 s for the entire non-deform train step.
        # Each term's contribution dx(q) += wgt(p)·dsamp(p) at
        # q = p + tap + s instead becomes a STATICALLY-padded array
        # (s is a Python int; only the tap shift is traced), the 27
        # pads tree-add into one per-tap canvas T (pure fusable
        # elementwise work), and the accumulator sees ONE dynamic
        # read-modify-write per tap instead of span³.
        T = jnp.zeros((B, Do + 2 * radius, Ho + 2 * radius,
                       Wo + 2 * radius, C), compute_dtype)
        for iz in range(span):
            for iy in range(span):
                for ix in range(span):
                    start = (0,
                             lo + tap[0] + iz - radius,
                             lo + tap[1] + iy - radius,
                             lo + tap[2] + ix - radius,
                             0)
                    xs = jax.lax.dynamic_slice(
                        xp, start, (B, Do, Ho, Wo, C))
                    wgt = hz[iz] * hy[iy] * hx[ix]
                    samp = samp + wgt[..., None] * xs
                    # t = sum_c dsamp.xs -- shared by all 3 offset grads
                    t = jnp.sum(dsamp * xs, axis=-1)
                    dz = dz + (dhz[iz] * hy[iy] * hx[ix]) * t
                    dy = dy + (hz[iz] * dhy[iy] * hx[ix]) * t
                    dxo = dxo + (hz[iz] * hy[iy] * dhx[ix]) * t
                    # dx: static pad to window position (iz, iy, ix)
                    u = wgt[..., None] * dsamp
                    T = T + jnp.pad(
                        u, ((0, 0),
                            (iz, 2 * radius - iz),
                            (iy, 2 * radius - iy),
                            (ix, 2 * radius - ix),
                            (0, 0)))
        tstart = (0, lo + tap[0] - radius, lo + tap[1] - radius,
                  lo + tap[2] - radius, 0)
        tsize = (B, Do + 2 * radius, Ho + 2 * radius, Wo + 2 * radius, C)
        cur = jax.lax.dynamic_slice(dxp, tstart, tsize)
        dxp = jax.lax.dynamic_update_slice(dxp, cur + T, tstart)
        if depthwise:
            dw_k = jnp.sum(g * samp, axis=(0, 1, 2, 3))
        else:
            sg = samp.reshape(B, Do * Ho * Wo, groups, cpg)
            gg = g.reshape(B, Do * Ho * Wo, groups, opg)
            dw_k = jnp.einsum("bpgc,bpgo->gco", sg, gg)
        doff_k = jnp.stack([dz, dy, dxo], axis=-1)  # (B,D,H,W,3)
        return dxp, (dw_k, doff_k)

    dxp0 = jnp.zeros_like(xp)
    dxp, (dw_ks, doff_ks) = jax.lax.scan(tap_body, dxp0, (off, taps, w_k))

    dx = jax.lax.slice(
        dxp, (0, lo, lo, lo, 0), (B, lo + D, lo + H, lo + W, C)
    ).astype(x.dtype)
    # clip straight-through: no gradient where the raw offset was clipped
    doff = jnp.where(jnp.abs(off_raw) <= radius, doff_ks, 0.0)
    doff = jnp.moveaxis(doff, 0, 4).reshape(B, Do, Ho, Wo, 3 * K).astype(
        offset.dtype)
    if depthwise:
        dw = dw_ks.reshape(kd, kh, kw, 1, C).astype(w.dtype)
    else:
        dw = dw_ks.transpose(0, 2, 1, 3).reshape(
            kd, kh, kw, cin_g, cout).astype(w.dtype)
    return dx, doff, dw


_window_core.defvjp(_window_core_fwd, _window_core_bwd)


def deform_conv3d_window(x, offset, w, bias=None, *, stride=1, padding=0,
                         dilation=1, groups: int = 1, radius: int = 2):
    """Gather-free deformable 3D convolution, exact for |D| <= radius
    (larger learned offsets are clipped; they are zero-initialised and
    stay sub-voxel in practice -- deform_conv.py:80-91).

    TPU-first rationale: XLA's gather lowers to an element-serialised
    loop on TPU (~0.1 GB/s measured) -- the D3D-style 8-corner gather is
    the single slowest thing a TPU can do. But deformable sampling with
    LOCAL offsets is a band-sparse linear operator: for every tap k,
      sample_k(p) = sum_{s in [-R,R]^3} hat(D_k(p)+b_k-s) * x(p+s),
    where hat(t)=max(0,1-|t|) factorises per axis and x(p+s) is a
    STATIC shifted slice. Everything is dense VPU FMAs + static slices
    (fully fusable); the per-tap channel mixing stays a GEMM on the MXU.
    The tap loop is a lax.scan so the compiled graph holds ONE window.
    Gradients use an explicit scatter-free VJP (_window_core_bwd);
    DLKA_WINDOW_CUSTOM_VJP=0 falls back to XLA autodiff for debugging.

    Requires stride 1 (all deform convs in the reference models are
    stride-1 3^3 -- transformerblock.py:634-652).
    """
    st = tuple(_tuple(stride, 3))
    pad = tuple(_tuple(padding, 3))
    dil = tuple(_tuple(dilation, 3))
    if os.environ.get("DLKA_WINDOW_CUSTOM_VJP", "1") == "0":
        out = _window_impl(x, offset, w, st, pad, dil, groups, radius)
    else:
        out = _window_core(x, offset, w, st, pad, dil, groups, radius)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
