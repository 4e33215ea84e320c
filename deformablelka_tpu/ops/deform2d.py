"""2D deformable convolution (torchvision `DeformConv2d` semantics).

Reference behaviour reproduced (do-not-copy; re-derived from op semantics):
  /root/reference/2D/deformable_LKA/deformable_LKA.py:5-30 — the 2D D-LKA
  path drives `torchvision.ops.DeformConv2d` with offsets predicted by a
  same-kernel conv; offset tensor has 2*kh*kw channels ordered (dy, dx) per
  tap, taps row-major over (kh, kw); bilinear sampling with zero outside.

TPU-first design
----------------
The irregular bilinear gather is expressed as four aligned gathers over a
flattened (H*W, C) feature tile plus an FMA — the channel dim stays the
128-lane minor axis so XLA vectorises the gather rows. The per-tap weighted
reduction is a batched matmul (im2col → MXU) for grouped convs and an
elementwise FMA for the depthwise case used by D-LKA.

Everything is differentiable through `jnp` autodiff (gather/scatter VJPs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deformablelka_tpu.ops.convs import _tuple


def _bilinear_gather(x_flat, H, W, ys, xs, compute_dtype):
    """Sample x at fractional positions with zero padding outside.

    Args:
      x_flat: (B, H*W, C) features.
      ys, xs: (B, P, K) fractional sample coordinates (row, col).
    Returns:
      (B, P, K, C) sampled values.
    """
    B, _, C = x_flat.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    dy = (ys - y0).astype(compute_dtype)[..., None]
    dx = (xs - x0).astype(compute_dtype)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    out = None
    for (oy, ox) in ((0, 0), (0, 1), (1, 0), (1, 1)):
        yi = y0i + oy
        xi = x0i + ox
        valid = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
        lin = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)  # (B, P, K)
        Bp, P, K = lin.shape
        g = jnp.take_along_axis(
            x_flat, lin.reshape(B, P * K, 1), axis=1)  # (B, P*K, C)
        g = g.reshape(B, P, K, C)
        wy = dy if oy else (1.0 - dy)
        wx = dx if ox else (1.0 - dx)
        w = (wy * wx) * valid[..., None].astype(compute_dtype)
        contrib = g * w
        out = contrib if out is None else out + contrib
    return out


def deform_sample2d(x, offset, kernel_size, *, stride=1, padding=0, dilation=1):
    """Build the deformable im2col tensor: (B, Ho, Wo, K, C).

    offset: (B, Ho, Wo, 2K), channel 2k = dy, 2k+1 = dx for tap k (row-major
    over the kernel window) — torchvision layout.
    """
    B, H, W, C = x.shape
    kh, kw = _tuple(kernel_size, 2)
    sh, sw = _tuple(stride, 2)
    ph, pw = _tuple(padding, 2)
    dh, dw = _tuple(dilation, 2)
    K = kh * kw
    Ho = (H + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    Wo = (W + 2 * pw - dw * (kw - 1) - 1) // sw + 1
    assert offset.shape == (B, Ho, Wo, 2 * K), (offset.shape, (B, Ho, Wo, 2 * K))

    compute_dtype = x.dtype
    # Base sampling grid per output position and tap.
    oy = jnp.arange(Ho, dtype=jnp.float32) * sh - ph          # (Ho,)
    ox = jnp.arange(Wo, dtype=jnp.float32) * sw - pw          # (Wo,)
    ky = jnp.arange(kh, dtype=jnp.float32) * dh               # (kh,)
    kx = jnp.arange(kw, dtype=jnp.float32) * dw               # (kw,)
    base_y = (oy[:, None, None, None] + ky[None, None, :, None])  # (Ho,1,kh,1)
    base_x = (ox[None, :, None, None] + kx[None, None, None, :])  # (1,Wo,1,kw)
    base_y = jnp.broadcast_to(base_y, (Ho, Wo, kh, kw)).reshape(1, Ho * Wo, K)
    base_x = jnp.broadcast_to(base_x, (Ho, Wo, kh, kw)).reshape(1, Ho * Wo, K)

    off = offset.reshape(B, Ho * Wo, K, 2).astype(jnp.float32)
    ys = base_y + off[..., 0]
    xs = base_x + off[..., 1]

    x_flat = x.reshape(B, H * W, C)
    samp = _bilinear_gather(x_flat, H, W, ys, xs, compute_dtype)
    return samp.reshape(B, Ho, Wo, K, C)


def deform_conv2d(x, offset, w, bias=None, *, stride=1, padding=0, dilation=1,
                  groups: int = 1):
    """Deformable 2D convolution.

    Args:
      x: (B, H, W, Cin).
      offset: (B, Ho, Wo, 2*kh*kw) — (dy, dx) per tap, taps row-major.
      w: (kh, kw, Cin // groups, Cout).
      groups: Cin == Cout == groups gives the depthwise path used by D-LKA.
    Returns:
      (B, Ho, Wo, Cout).
    """
    kh, kw, cin_g, cout = w.shape
    B, H, W, C = x.shape
    K = kh * kw
    samp = deform_sample2d(x, offset, (kh, kw), stride=stride,
                           padding=padding, dilation=dilation)
    Bo, Ho, Wo, _, _ = samp.shape

    if groups == C and cin_g == 1 and cout == C:
        # Depthwise: per-channel FMA over taps (VPU-friendly).
        wk = w.reshape(K, C).astype(samp.dtype)
        out = jnp.einsum("bhwkc,kc->bhwc", samp, wk)
    else:
        # Grouped im2col → MXU matmul. Output channel g*opg+o uses input
        # channel slice of group g.
        cpg = C // groups
        opg = cout // groups
        samp_g = samp.reshape(B, Ho * Wo, K, groups, cpg)
        w_g = w.reshape(K, cpg, groups, opg).astype(samp.dtype)
        out = jnp.einsum("bpkgc,kcgo->bpgo", samp_g, w_g)
        out = out.reshape(B, Ho, Wo, cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
