"""Pallas TPU kernel: 2D depthwise deformable convolution.

The 2D flagship's decoder runs 8 deformableLKABlocks, each with two
DEPTHWISE deformable convs (5x5 pad 2 and 7x7 dil-3 pad 9,
/root/reference/2D/deformable_LKA/deformable_LKA.py:10-29 via
torchvision DeformConv2d with groups=dim) — the dominant 2D latency
after the encoder (PERF.md: 2.4-4.5 ms per block). Offsets are
per-pixel, shared across channels (one offset group).

Same dense-window strategy as the 3D kernel (ops/pallas/deform3d_kernel
module docstring): for tap k with LOCAL offset clipped to |d|<=R,

    sample_k(p) = sum_{s in [-R,R+1]^2} hy(dy-sy)*hx(dx-sx) * x(p+b_k+s)

— static-shape VMEM slices, pure VPU FMAs, no gather. Exact for
|d| <= R; the mini-train measurement (PERF.md 2026-08-17) found trained
offsets at absmax 0.034, so R=1 is lossless in practice (R
configurable; exact gather remains the parity default).

Depthwise means no MXU mixing step: each tap's sample is scaled by the
per-channel tap weight and accumulated directly in VMEM. Channel
blocks > 128 lanes split over the grid (offsets are reused per block).

Remote-Mosaic constraints respected (deform3d_kernel.py): f32 blocks,
tiles <= 16, offset rows read INSIDE the innermost fori (a
dynamically-indexed read closed over into a nested fori fails to
compile), no manual DMA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deformablelka_tpu.ops.pallas.deform3d_kernel import _tile_of

MAX_LANES = 128


def _kernel(off_ref, w_ref, xt_ref, out_ref, *, TY, TX, C, kk, dil, R, m):
    """One grid step = one (channel block, batch*tile).

    off_ref: (2*kk*kk, TY, TX) VMEM f32 — (dy, dx) rows per tap.
    w_ref:   (kk*kk, C) VMEM f32 — per-tap depthwise weights.
    xt_ref:  (TY+2m, TX+2m, C) VMEM f32 halo'd tile.
    out_ref: (TY, TX, C).
    """
    span = 2 * R + 1  # s ∈ [-R, R]; ±(R+1) corners are zero-weight
    K = kk * kk
    pad = (kk // 2) * dil

    def tap_body(k, acc):
        by = (k // kk) * dil - pad
        bx = (k % kk) * dil - pad

        def win_body(widx, samp):
            sy = widx // span - R
            sx = widx % span - R
            dy = jnp.clip(off_ref[2 * k], -R, R)
            dx = jnp.clip(off_ref[2 * k + 1], -R, R)
            wgt = (jnp.maximum(0.0, 1.0 - jnp.abs(dy - sy))
                   * jnp.maximum(0.0, 1.0 - jnp.abs(dx - sx)))
            xs = xt_ref[pl.ds(m + by + sy, TY),
                        pl.ds(m + bx + sx, TX), :]
            return samp + wgt[..., None] * xs

        samp = jax.lax.fori_loop(0, span * span, win_body,
                                 jnp.zeros((TY, TX, C), jnp.float32))
        return acc + w_ref[k] * samp

    out_ref[...] = jax.lax.fori_loop(
        0, K, tap_body, jnp.zeros((TY, TX, C), jnp.float32))


def _make_tiles(xp, TY, TX, m):
    """xp: (B, H+2m, W+2m, C) → (B*n_t*(TY+2m), TX+2m, C)."""
    B, Hp, Wp, C = xp.shape
    H, W = Hp - 2 * m, Wp - 2 * m
    tiles = []
    for b in range(B):
        for y in range(H // TY):
            for xx in range(W // TX):
                tiles.append(jax.lax.slice(
                    xp, (b, y * TY, xx * TX, 0),
                    (b + 1, y * TY + TY + 2 * m,
                     xx * TX + TX + 2 * m, C)))
    return jnp.concatenate([t[0] for t in tiles], axis=0)


def pallas2d_supported(w_shape, stride, padding, dilation, groups, C,
                       spatial) -> bool:
    from deformablelka_tpu.ops.convs import _tuple
    kh, kw = w_shape[:2]
    dil = _tuple(dilation, 2)
    pad = _tuple(padding, 2)
    return (jax.default_backend() in ("tpu", "axon")
            and kh == kw and dil[0] == dil[1]
            and tuple(_tuple(stride, 2)) == (1, 1)
            and tuple(pad) == ((kh // 2) * dil[0],) * 2
            and groups == C and w_shape[2] == 1 and w_shape[3] == C
            and C % min(C, MAX_LANES) == 0
            and all(_tile_of(int(s)) >= 4 for s in spatial))


def _forward(x, offset, w, radius: int, dil: int,
             interpret: bool = False):
    """x: (B, H, W, C); offset: (B, H, W, 2*kk²) (dy,dx) per tap;
    w: (kk, kk, 1, C) depthwise. Stride 1, 'same' padding."""
    B, H, W, C = x.shape
    kk = w.shape[0]
    K = kk * kk
    R = radius
    m = (kk // 2) * dil + R
    CB = min(C, MAX_LANES)
    assert C % CB == 0, (
        f"C={C} must be a multiple of {CB} lanes (pallas2d_supported "
        f"gates this; C=192-style shapes silently drop channels in the "
        f"tile split otherwise)")
    n_c = C // CB
    TY, TX = _tile_of(H), _tile_of(W)
    n_y, n_x = H // TY, W // TX
    n_t = n_y * n_x

    xp = jnp.pad(x, ((0, 0), (m, m), (m, m), (0, 0))).astype(jnp.float32)
    tiles = _make_tiles(xp, TY, TX, m)
    if n_c > 1:
        tiles = jnp.concatenate(
            [tiles[..., c * CB:(c + 1) * CB] for c in range(n_c)], axis=0)
    # offsets: (B, H, W, 2K) → (B, 2K, H, W) → tile blocks stacked on 0
    off = jnp.transpose(offset.astype(jnp.float32), (0, 3, 1, 2))
    off = off.reshape(B, 2 * K, n_y, TY, n_x, TX)
    off = jnp.transpose(off, (0, 2, 4, 1, 3, 5))
    off = off.reshape(B * n_t * 2 * K, TY, TX)
    # Mosaic requires the sublane (2nd-to-last) block dim divisible by
    # 8 unless it equals the array dim; with n_c > 1 the (K, CB) block
    # sits in an (n_c*K, CB) array, so pad taps to a multiple of 8
    # (padding rows are never read — the kernel loops k < K).
    K_pad = K if n_c == 1 else -(-K // 8) * 8
    w_kc = w.reshape(K, C).astype(jnp.float32)
    if K_pad != K:
        w_kc = jnp.pad(w_kc, ((0, K_pad - K), (0, 0)))
    if n_c > 1:
        w_kc = jnp.concatenate(
            [w_kc[:, c * CB:(c + 1) * CB] for c in range(n_c)], axis=0)

    kern = functools.partial(_kernel, TY=TY, TX=TX, C=CB, kk=kk, dil=dil,
                             R=R, m=m)
    span = 2 * R + 1
    out = pl.pallas_call(
        kern,
        grid=(n_c, B * n_t),
        in_specs=[
            pl.BlockSpec((2 * K, TY, TX), lambda c, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K_pad, CB), lambda c, t: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TY + 2 * m, TX + 2 * m, CB),
                         lambda c, t, n=B * n_t: (c * n + t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TY, TX, CB),
                               lambda c, t, n=B * n_t: (c * n + t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_c * B * n_t * TY, TX, CB),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * K * span * span,
            bytes_accessed=2 * x.size * 4 + offset.size * 4,
            transcendentals=0),
        interpret=interpret,
    )(off, w_kc, tiles)
    s = out.reshape(n_c, B, n_y, n_x, TY, TX, CB)
    s = jnp.transpose(s, (1, 2, 4, 3, 5, 0, 6))
    return s.reshape(B, H, W, C).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def deform_dw_conv2d_pallas(x, offset, w, radius: int = 2, dil: int = 1,
                            interpret: bool = False):
    """Depthwise deformable 2D conv (stride 1, 'same' padding); exact
    for |offset| <= radius. x: (B,H,W,C); offset: (B,H,W,2kk²);
    w: (kk,kk,1,C)."""
    return _forward(x, offset, w, radius, dil, interpret)


def _fwd(x, offset, w, radius, dil, interpret):
    return _forward(x, offset, w, radius, dil, interpret), (x, offset, w)


def _bwd(radius, dil, interpret, res, g):
    from deformablelka_tpu.ops.deform2d import deform_conv2d_window
    x, offset, w = res
    kk = w.shape[0]
    C = x.shape[-1]

    def f(x, offset, w):
        return deform_conv2d_window(
            x, offset, w, None, stride=1, padding=(kk // 2) * dil,
            dilation=dil, groups=C, radius=radius)

    _, vjp = jax.vjp(f, x, offset, w)
    return vjp(g.astype(x.dtype))


deform_dw_conv2d_pallas.defvjp(_fwd, _bwd)
