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

import jax
import jax.numpy as jnp

from deformablelka_tpu.ops.convs import _tuple


def _trilinear_gather(x_flat, D, H, W, zs, ys, xs, compute_dtype):
    """Sample (B, D*H*W, C) at fractional (z, y, x); zero outside.

    zs/ys/xs: (B, P, K). Returns (B, P, K, C).
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
                Bp, P, K = lin.shape
                g = jnp.take_along_axis(
                    x_flat, lin.reshape(B, P * K, 1), axis=1).reshape(B, P, K, C)
                wz = dz if oz else (1.0 - dz)
                wy = dy if oy else (1.0 - dy)
                wx = dx if ox else (1.0 - dx)
                w = (wz * wy * wx) * valid[..., None].astype(compute_dtype)
                contrib = g * w
                out = contrib if out is None else out + contrib
    return out


def deform_sample3d(x, offset, kernel_size, *, stride=1, padding=0, dilation=1):
    """Deformable im2col: (B, Do, Ho, Wo, K, C).

    offset: (B, Do, Ho, Wo, 3K) with channels (Δd, Δh, Δw) per tap,
    taps row-major over (kd, kh, kw) — D3D layout.
    """
    B, D, H, W, C = x.shape
    kd, kh, kw = _tuple(kernel_size, 3)
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
    kdv = jnp.arange(kd, dtype=jnp.float32) * dd
    khv = jnp.arange(kh, dtype=jnp.float32) * dh
    kwv = jnp.arange(kw, dtype=jnp.float32) * dw
    base_z = (od[:, None, None] + jnp.zeros((1, Ho, Wo)))[..., None, None, None] + \
        kdv[None, None, None, :, None, None]
    base_y = (oh[None, :, None] + jnp.zeros((Do, 1, Wo)))[..., None, None, None] + \
        khv[None, None, None, None, :, None]
    base_x = (ow[None, None, :] + jnp.zeros((Do, Ho, 1)))[..., None, None, None] + \
        kwv[None, None, None, None, None, :]
    shape6 = (Do, Ho, Wo, kd, kh, kw)
    base_z = jnp.broadcast_to(base_z, shape6).reshape(1, P, K)
    base_y = jnp.broadcast_to(base_y, shape6).reshape(1, P, K)
    base_x = jnp.broadcast_to(base_x, shape6).reshape(1, P, K)

    off = offset.reshape(B, P, K, 3).astype(jnp.float32)
    zs = base_z + off[..., 0]
    ys = base_y + off[..., 1]
    xs = base_x + off[..., 2]

    x_flat = x.reshape(B, D * H * W, C)
    samp = _trilinear_gather(x_flat, D, H, W, zs, ys, xs, compute_dtype)
    return samp.reshape(B, Do, Ho, Wo, K, C)


def deform_conv3d(x, offset, w, bias=None, *, stride=1, padding=0, dilation=1,
                  groups: int = 1):
    """Deformable 3D convolution (D3D semantics).

    Args:
      x: (B, D, H, W, Cin).
      offset: (B, Do, Ho, Wo, 3*kd*kh*kw).
      w: (kd, kh, kw, Cin // groups, Cout).
    Returns:
      (B, Do, Ho, Wo, Cout).
    """
    kd, kh, kw, cin_g, cout = w.shape
    B, D, H, W, C = x.shape
    K = kd * kh * kw
    samp = deform_sample3d(x, offset, (kd, kh, kw), stride=stride,
                           padding=padding, dilation=dilation)
    _, Do, Ho, Wo, _, _ = samp.shape

    if groups == C and cin_g == 1 and cout == C:
        wk = w.reshape(K, C).astype(samp.dtype)
        out = jnp.einsum("bdhwkc,kc->bdhwc", samp, wk)
    else:
        cpg = C // groups
        opg = cout // groups
        samp_g = samp.reshape(B, Do * Ho * Wo, K, groups, cpg)
        w_g = w.reshape(K, cpg, groups, opg).astype(samp.dtype)
        out = jnp.einsum("bpkgc,kcgo->bpgo", samp_g, w_g)
        out = out.reshape(B, Do, Ho, Wo, cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
