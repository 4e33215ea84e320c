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
128-lane minor axis so XLA vectorises the gather rows. The kernel-tap loop
is streamed (unrolled in the XLA program) so peak memory is O(B·P·C), not
O(B·P·K·C) — an im2col tensor with K on the minor axis would also pad
catastrophically against the 128-lane layout.

Everything is differentiable through `jnp` autodiff (gather/scatter VJPs).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

from deformablelka_tpu.ops.convs import _tuple


def _bilinear_gather(x_flat, H, W, ys, xs, compute_dtype):
    """Sample x at fractional positions with zero padding outside.

    Args:
      x_flat: (B, H*W, C) features.
      ys, xs: (B, P) fractional sample coordinates (row, col).
    Returns:
      (B, P, C) sampled values.
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
        lin = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)  # (B, P)
        g = jnp.take_along_axis(x_flat, lin[..., None], axis=1)
        wy = dy if oy else (1.0 - dy)
        wx = dx if ox else (1.0 - dx)
        w = (wy * wx) * valid[..., None].astype(compute_dtype)
        contrib = g * w
        out = contrib if out is None else out + contrib
    return out


def _bilinear_gather_slab(xpad, H, W, ys, xs, compute_dtype):
    """Slab variant of `_bilinear_gather`: ONE `lax.gather` per tap
    fetching the (2, 2, C) corner slab instead of 4 row gathers (see
    ops/deform3d._trilinear_gather_slab for the construction — 1-pixel
    zero ring + clipped starts makes it exact with PROMISE_IN_BOUNDS).

    xpad: (B, H+2, W+2, C) zero-padded; ys, xs: (B, P).
    """
    C = xpad.shape[-1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    dy = (ys - y0).astype(compute_dtype)[..., None]
    dx = (xs - x0).astype(compute_dtype)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    idx = jnp.stack([jnp.clip(y0i, -1, H - 1) + 1,
                     jnp.clip(x0i, -1, W - 1) + 1], axis=-1)
    dn = lax.GatherDimensionNumbers(offset_dims=(1, 2, 3),
                                    collapsed_slice_dims=(),
                                    start_index_map=(0, 1))
    g = jax.vmap(lambda xp, ix: lax.gather(
        xp, ix, dn, slice_sizes=(2, 2, C),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS))(xpad, idx)
    out = None
    for oy in (0, 1):
        wy = dy if oy else (1.0 - dy)
        vy = (y0i + oy >= 0) & (y0i + oy < H)
        for ox in (0, 1):
            wx = dx if ox else (1.0 - dx)
            vx = (x0i + ox >= 0) & (x0i + ox < W)
            wgt = (wy * wx) * (vy & vx)[..., None].astype(compute_dtype)
            contrib = g[:, :, oy, ox, :] * wgt
            out = contrib if out is None else out + contrib
    return out


def deform_conv2d(x, offset, w, bias=None, *, stride=1, padding=0, dilation=1,
                  groups: int = 1):
    """Deformable 2D convolution, tap-streaming.

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
    sh, sw = _tuple(stride, 2)
    ph, pw = _tuple(padding, 2)
    dh, dw = _tuple(dilation, 2)
    K = kh * kw
    Ho = (H + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    Wo = (W + 2 * pw - dw * (kw - 1) - 1) // sw + 1
    assert offset.shape == (B, Ho, Wo, 2 * K), (offset.shape,
                                                (B, Ho, Wo, 2 * K))

    compute_dtype = x.dtype
    P = Ho * Wo
    oy = jnp.arange(Ho, dtype=jnp.float32) * sh - ph
    ox = jnp.arange(Wo, dtype=jnp.float32) * sw - pw
    base_y = jnp.broadcast_to(oy[:, None], (Ho, Wo)).reshape(1, P)
    base_x = jnp.broadcast_to(ox[None, :], (Ho, Wo)).reshape(1, P)
    off = offset.reshape(B, P, K, 2).astype(jnp.float32)
    off_k = jnp.moveaxis(off, 2, 0)  # (K, B, P, 2)
    taps = jnp.asarray([[i * dh, j * dw] for i in range(kh)
                        for j in range(kw)], jnp.float32)

    slab = os.environ.get("DLKA_GATHER_IMPL", "slab") == "slab"
    if slab:
        x_src = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    else:
        x_src = x.reshape(B, H * W, C)
    depthwise = groups == C and cin_g == 1 and cout == C
    cpg = C // groups
    opg = cout // groups
    if depthwise:
        w_k = w.reshape(K, C)
    else:
        w_k = w.reshape(K, cpg, groups, opg).transpose(0, 2, 1, 3)

    def body(acc, xs_in):
        off_t, tap, wt = xs_in
        ys = base_y + tap[0] + off_t[..., 0]
        xs = base_x + tap[1] + off_t[..., 1]
        if slab:
            samp = _bilinear_gather_slab(x_src, H, W, ys, xs,
                                         compute_dtype)
        else:
            samp = _bilinear_gather(x_src, H, W, ys, xs, compute_dtype)
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
    out = out.reshape(B, Ho, Wo, cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def deform_sample2d(x, offset, kernel_size, *, stride=1, padding=0,
                    dilation=1):
    """Deformable im2col (B, Ho, Wo, K, C) — reference/debug path only."""
    B, H, W, C = x.shape
    kh, kw = _tuple(kernel_size, 2)
    sh, sw = _tuple(stride, 2)
    ph, pw = _tuple(padding, 2)
    dh, dw = _tuple(dilation, 2)
    K = kh * kw
    Ho = (H + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    Wo = (W + 2 * pw - dw * (kw - 1) - 1) // sw + 1
    P = Ho * Wo
    oy = jnp.arange(Ho, dtype=jnp.float32) * sh - ph
    ox = jnp.arange(Wo, dtype=jnp.float32) * sw - pw
    base_y = jnp.broadcast_to(oy[:, None], (Ho, Wo)).reshape(1, P)
    base_x = jnp.broadcast_to(ox[None, :], (Ho, Wo)).reshape(1, P)
    off = offset.reshape(B, P, K, 2).astype(jnp.float32)
    x_flat = x.reshape(B, H * W, C)
    cols = []
    for i in range(kh):
        for j in range(kw):
            k = i * kw + j
            ys = base_y + i * dh + off[:, :, k, 0]
            xs = base_x + j * dw + off[:, :, k, 1]
            cols.append(_bilinear_gather(x_flat, H, W, ys, xs, x.dtype))
    samp = jnp.stack(cols, axis=2)
    return samp.reshape(B, Ho, Wo, K, C)


# ---------------------------------------------------------------------------
# Dense-window deformable conv 2D — the TPU-fast path (gather-free).
# ---------------------------------------------------------------------------

def _window2d_prep(x, w, stride, padding, dilation, groups, radius):
    """Shared geometry for the 2D window forward/backward."""
    kh, kw, cin_g, cout = w.shape
    B, H, W, C = x.shape
    sh, sw = _tuple(stride, 2)
    assert sh == sw == 1, "window path requires stride 1"
    ph, pw = _tuple(padding, 2)
    dh, dw = _tuple(dilation, 2)
    K = kh * kw
    taps = jnp.asarray(
        [[i * dh - ph, j * dw - pw]
         for i in range(kh) for j in range(kw)], jnp.int32)
    depthwise = groups == C and cin_g == 1 and cout == C
    cpg = C // groups
    opg = cout // groups
    if depthwise:
        w_k = w.reshape(K, C)
    else:
        w_k = w.reshape(K, cpg, groups, opg).transpose(0, 2, 1, 3)
    base_min = min(-ph, -pw)
    base_max = max((kh - 1) * dh - ph, (kw - 1) * dw - pw)
    lo = radius - base_min
    hi = radius + base_max
    return (K, taps, depthwise, cpg, opg, w_k, lo, hi)


def _hats2d(off_k, radius, compute_dtype):
    s_range = jnp.arange(-radius, radius + 1, dtype=compute_dtype)
    s = s_range[:, None, None, None]
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(off_k[..., 0][None] - s))
    hx = jnp.maximum(0.0, 1.0 - jnp.abs(off_k[..., 1][None] - s))
    return hy, hx


def _window2d_impl(x, offset, w, stride, padding, dilation, groups,
                   radius):
    """Forward body of deform_conv2d_window (no bias)."""
    kh, kw, cin_g, cout = w.shape
    B, H, W, C = x.shape
    Ho, Wo = H, W
    K, taps, depthwise, cpg, opg, w_k, lo, hi = _window2d_prep(
        x, w, stride, padding, dilation, groups, radius)
    assert offset.shape == (B, Ho, Wo, 2 * K)

    compute_dtype = x.dtype
    off = jnp.moveaxis(
        offset.reshape(B, Ho, Wo, K, 2), 3, 0).astype(compute_dtype)
    off = jnp.clip(off, -radius, radius)

    # window needs only s in [-R, R] -- see the span derivation in
    # deform3d (the +-(R+1) corners carry weight 0 for clipped offsets)
    xp = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
    span = 2 * radius + 1

    if os.environ.get("DLKA_DEFORM2D_UNROLL", "0") == "1":
        # Unrolled tap loop: the lax.scan streams one tap per
        # iteration, so at decoder shapes (56²×96 bf16 = 0.6 MB maps)
        # every tap pays kernel-launch + acc round-trip overhead that
        # dwarfs the FMA work — K=49 measured 1.438 ms vs a ~0.1 ms
        # bandwidth floor (probe_dec0_r4, 2026-08-20). Unrolling gives
        # XLA the whole tap set to fuse, and the static python taps
        # turn every window read into a static strided slice. Same
        # math, same accumulation order.
        ph, pw = _tuple(padding, 2)
        dh, dw = _tuple(dilation, 2)
        taps_static = [(i * dh - ph, j * dw - pw)
                       for i in range(kh) for j in range(kw)]
        out = jnp.zeros((B, Ho, Wo, cout), compute_dtype)
        for k, (ty, tx) in enumerate(taps_static):
            hy, hx = _hats2d(off[k], radius, compute_dtype)
            samp = jnp.zeros((B, Ho, Wo, C), compute_dtype)
            for iy in range(span):
                y0 = lo + ty + iy - radius
                for ix in range(span):
                    x0 = lo + tx + ix - radius
                    wgt = (hy[iy] * hx[ix])[..., None]
                    xs = xp[:, y0:y0 + Ho, x0:x0 + Wo, :]
                    samp = samp + wgt * xs
            if depthwise:
                out = out + samp * w_k[k].astype(compute_dtype)
            else:
                sg = samp.reshape(B, Ho * Wo, groups, cpg)
                out = out + jnp.einsum(
                    "bpgc,gco->bpgo", sg,
                    w_k[k].astype(compute_dtype)).reshape(
                    B, Ho, Wo, cout)
        return out

    def tap_body(acc, kt):
        off_k, tap, wt = kt
        hy, hx = _hats2d(off_k, radius, compute_dtype)
        samp = jnp.zeros((B, Ho, Wo, C), compute_dtype)
        for iy in range(span):
            for ix in range(span):
                wgt = (hy[iy] * hx[ix])[..., None]
                start = (0,
                         lo + tap[0] + iy - radius,
                         lo + tap[1] + ix - radius,
                         0)
                xs = jax.lax.dynamic_slice(xp, start, (B, Ho, Wo, C))
                samp = samp + wgt * xs
        if depthwise:
            contrib = samp * wt.astype(compute_dtype)
        else:
            sg = samp.reshape(B, Ho * Wo, groups, cpg)
            contrib = jnp.einsum(
                "bpgc,gco->bpgo", sg, wt.astype(compute_dtype)).reshape(
                B, Ho, Wo, cout)
        return acc + contrib, None

    init = jnp.zeros((B, Ho, Wo, cout), compute_dtype)
    out, _ = jax.lax.scan(tap_body, init, (off, taps, w_k))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _window2d_core(x, offset, w, stride, padding, dilation, groups,
                   radius):
    return _window2d_impl(x, offset, w, stride, padding, dilation, groups,
                          radius)


def _window2d_core_fwd(x, offset, w, stride, padding, dilation, groups,
                       radius):
    out = _window2d_impl(x, offset, w, stride, padding, dilation, groups,
                         radius)
    return out, (x, offset, w)


def _window2d_core_bwd(stride, padding, dilation, groups, radius, res, g):
    """Explicit scatter-free VJP with per-tap recomputation -- the 2D
    analog of deform3d._window_core_bwd (see that docstring for why XLA
    autodiff of the scan forward blows up the compile)."""
    x, offset, w = res
    kh, kw, cin_g, cout = w.shape
    B, H, W, C = x.shape
    Ho, Wo = H, W
    K, taps, depthwise, cpg, opg, w_k, lo, hi = _window2d_prep(
        x, w, stride, padding, dilation, groups, radius)

    compute_dtype = x.dtype
    off_raw = jnp.moveaxis(
        offset.reshape(B, Ho, Wo, K, 2), 3, 0).astype(compute_dtype)
    off = jnp.clip(off_raw, -radius, radius)

    xp = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
    span = 2 * radius + 1
    g = g.astype(compute_dtype)

    def tap_body(dxp, kt):
        off_k, tap, wt = kt
        hy, hx = _hats2d(off_k, radius, compute_dtype)
        s_range = jnp.arange(-radius, radius + 1, dtype=compute_dtype)
        s = s_range[:, None, None, None]
        dhy = -jnp.sign(off_k[..., 0][None] - s) * (hy > 0)
        dhx = -jnp.sign(off_k[..., 1][None] - s) * (hx > 0)

        if depthwise:
            dsamp = g * wt.astype(compute_dtype)
        else:
            gg = g.reshape(B, Ho * Wo, groups, opg)
            dsamp = jnp.einsum(
                "bpgo,gco->bpgc", gg, wt.astype(compute_dtype)).reshape(
                B, Ho, Wo, C)

        samp = jnp.zeros((B, Ho, Wo, C), compute_dtype)
        dy = jnp.zeros((B, Ho, Wo), compute_dtype)
        dxo = jnp.zeros((B, Ho, Wo), compute_dtype)
        # dx push form without per-term RMW (see the 3D twin for the
        # 972 ms measurement that motivated it): each window term pads
        # STATICALLY to its (iy, ix) position, the span² terms tree-add
        # into one per-tap canvas, and the padded accumulator sees one
        # dynamic read-modify-write per TAP instead of per term.
        T = jnp.zeros((B, Ho + 2 * radius, Wo + 2 * radius, C),
                      compute_dtype)
        for iy in range(span):
            for ix in range(span):
                start = (0,
                         lo + tap[0] + iy - radius,
                         lo + tap[1] + ix - radius,
                         0)
                xs = jax.lax.dynamic_slice(xp, start, (B, Ho, Wo, C))
                wgt = hy[iy] * hx[ix]
                samp = samp + wgt[..., None] * xs
                t = jnp.sum(dsamp * xs, axis=-1)
                dy = dy + (dhy[iy] * hx[ix]) * t
                dxo = dxo + (hy[iy] * dhx[ix]) * t
                u = wgt[..., None] * dsamp
                T = T + jnp.pad(
                    u, ((0, 0),
                        (iy, 2 * radius - iy),
                        (ix, 2 * radius - ix),
                        (0, 0)))
        tstart = (0, lo + tap[0] - radius, lo + tap[1] - radius, 0)
        tsize = (B, Ho + 2 * radius, Wo + 2 * radius, C)
        cur = jax.lax.dynamic_slice(dxp, tstart, tsize)
        dxp = jax.lax.dynamic_update_slice(dxp, cur + T, tstart)
        if depthwise:
            dw_k = jnp.sum(g * samp, axis=(0, 1, 2))
        else:
            sg = samp.reshape(B, Ho * Wo, groups, cpg)
            gg = g.reshape(B, Ho * Wo, groups, opg)
            dw_k = jnp.einsum("bpgc,bpgo->gco", sg, gg)
        doff_k = jnp.stack([dy, dxo], axis=-1)  # (B,H,W,2)
        return dxp, (dw_k, doff_k)

    dxp0 = jnp.zeros_like(xp)
    dxp, (dw_ks, doff_ks) = jax.lax.scan(tap_body, dxp0, (off, taps, w_k))

    dx = jax.lax.slice(
        dxp, (0, lo, lo, 0), (B, lo + H, lo + W, C)).astype(x.dtype)
    doff = jnp.where(jnp.abs(off_raw) <= radius, doff_ks, 0.0)
    doff = jnp.moveaxis(doff, 0, 3).reshape(B, Ho, Wo, 2 * K).astype(
        offset.dtype)
    if depthwise:
        dw = dw_ks.reshape(kh, kw, 1, C).astype(w.dtype)
    else:
        dw = dw_ks.transpose(0, 2, 1, 3).reshape(
            kh, kw, cin_g, cout).astype(w.dtype)
    return dx, doff, dw


_window2d_core.defvjp(_window2d_core_fwd, _window2d_core_bwd)


def deform_conv2d_window(x, offset, w, bias=None, *, stride=1, padding=0,
                         dilation=1, groups: int = 1, radius: int = 2):
    """Gather-free deformable 2D convolution, exact for |D| <= radius.

    Same construction as ops/deform3d.deform_conv3d_window (see its
    docstring for the TPU rationale -- XLA gathers run element-serialised
    on TPU): bilinear sampling with LOCAL offsets is a band-sparse
    operator; per tap,
      sample_k(p) = sum_{s in [-R,R]^2} hat(D_k(p)+b_k-s) * x(p+s),
    all static shifts + dense VPU FMAs; tap loop is a lax.scan.
    Gradients use an explicit scatter-free VJP (_window2d_core_bwd);
    DLKA_WINDOW_CUSTOM_VJP=0 falls back to XLA autodiff for debugging.
    Replaces torchvision's deform_conv2d CUDA gather
    (2D/deformable_LKA/deformable_LKA.py:18-29 usage: depthwise 5x5 and
    7x7 dilation-3, stride 1).
    """
    st = tuple(_tuple(stride, 2))
    pad = tuple(_tuple(padding, 2))
    dil = tuple(_tuple(dilation, 2))
    if os.environ.get("DLKA_WINDOW_CUSTOM_VJP", "1") == "0":
        out = _window2d_impl(x, offset, w, st, pad, dil, groups, radius)
    else:
        out = _window2d_core(x, offset, w, st, pad, dil, groups, radius)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def grid_sample_bilinear(x, grid):
    """torch F.grid_sample(mode='bilinear', align_corners=True) on NHWC.

    x: (B, H, W, C); grid: (B, Hg, Wg, 2) with (x, y) in [-1, 1]
    (torch channel order). Out-of-range samples are zero (torch
    padding_mode='zeros'). Used by the DAT deformable-attention encoder
    (DAT/dat_blocks.py:243-247).
    """
    B, H, W, C = x.shape
    Hg, Wg = grid.shape[1:3]
    gx = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    x_flat = x.reshape(B, H * W, C)
    out = _bilinear_gather(x_flat, H, W,
                           gy.reshape(B, Hg * Wg),
                           gx.reshape(B, Hg * Wg), x.dtype)
    return out.reshape(B, Hg, Wg, C)
