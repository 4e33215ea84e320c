"""Pallas TPU kernel: backward pass of the 3D deformable window conv.

Replaces the XLA scatter-free VJP (`ops.deform3d._window_core_bwd`)
for the training hot path — the TPU-native answer to the reference's
CUDA backward (/root/reference/3D/dcn/src/cuda/deform_im2col_cuda.cuh
:267-405: atomicAdd col2im + per-thread coordinate-gradient gathers).

The XLA backward already avoids scatters (per-tap static-pad canvas +
one dynamic RMW per tap), but every one of its 27 taps × 27 window
terms materialises full-array intermediates through HBM: samp/az/ay/ax
accumulators, the hat products, the padded dx canvas. This kernel runs
the same math with everything VMEM-resident per tile:

  grid = (B·n_tiles, 27), tap k innermost; the x-tile (halo 2), the
  g-tile and the dx canvas stay resident across all 27 taps (their
  index maps ignore k). Per (tile, tap) step:
    dsamp = g · w_kᵀ                      (MXU)
    per window term s ∈ {-1,0,1}³ (static Python loop, pl.ds slices):
      samp += hat·x(p+tap+s)              (VPU FMA, full-width hats)
      az/ay/ax += dhat-combo · x(p+tap+s) (VPU FMA ×3)
      dxc[p+tap+s] += hat·dsamp           (VMEM slice RMW)
    dz/dy/dx_off = Σ_c dsamp·a{z,y,x}     (3 lane reductions)
    dw_k^tile = sampᵀ · g                 (MXU)

Outputs: per-tile PADDED dx canvases (overlap-added axis-by-axis in
XLA — 3 shifted adds per axis, no serialized scatter), per-(tap,tile)
offset-gradient planes, and per-(tap,tile) dw partials summed in XLA.

Scope matches the forward kernels: 3³ taps, stride 1, dil 1, pad 1,
groups 1, radius 1 (the hybrid fast branch), C ≤ 128. Clip
straight-through (zero doff where |raw offset| > R) is applied by the
caller, exactly like the XLA VJP.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deformablelka_tpu.ops.pallas.deform3d_kernel import (
    MAX_TILE, MAX_TILE_Z, _make_tiles, _relu_hats, _tile_of)


def _sign_dhats(d, hats):
    """d hat(d−s)/dd = −sign(d−s) where hat > 0 (R=1, s ∈ {−1,0,1});
    matches the XLA VJP exactly (deform3d._window_core_bwd)."""
    return [-jnp.sign(d - s) * (h > 0)
            for s, h in zip((-1.0, 0.0, 1.0), hats)]


def _bwd_kernel(off_ref, xt_ref, g_ref, w_ref,
                dxc_ref, doff_ref, dw_ref, *, TZ, TY, TX, C):
    """One (tile t, tap k) step — see module docstring."""
    k = pl.program_id(1)
    bz = k // 9      # tap index 0..2 per axis (tap = idx - 1)
    by = (k // 3) % 3
    bx = k % 3

    wide = (TZ, TY, TX, C)
    # Live-state discipline (two failed attempts, 2026-08-20): (1) all
    # 9 hat + 18 dhat arrays broadcast to (..., C) up front spilled
    # 110.8 MB of registers at 16³C64; (2) (TZ,TY,TX)-plane hats with
    # the 27 window terms UNROLLED still stack-OOMed at 32³C32
    # (115.76M scoped vs the 64M kernel limit) — Mosaic keeps the
    # dynamic-slice RMW temporaries of every unrolled term live. The
    # shipped form runs the 27 window terms as a fori_loop with the
    # four accumulators as carry and recomputes the six hat/dhat
    # planes per term from the offset planes (cheap VPU math) — live
    # state is bounded at 4 accumulators + one xs slab regardless of
    # unrolling.
    dz_off = jnp.clip(off_ref[0], -1.0, 1.0)
    dy_off = jnp.clip(off_ref[1], -1.0, 1.0)
    dx_off = jnp.clip(off_ref[2], -1.0, 1.0)

    g = g_ref[...]
    # dsamp(p, ci) = Σ_co g(p, co) · w_k(ci, co)
    dsamp = jax.lax.dot_general(
        g.reshape(TZ * TY * TX, C), w_ref[0],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(wide)

    @pl.when(k == 0)
    def _():
        dxc_ref[...] = jnp.zeros_like(dxc_ref)

    def win_body(widx, carry):
        samp, az, ay, ax = carry
        iz = widx // 9
        iy = (widx // 3) % 3
        ix = widx % 3
        sz = (iz - 1).astype(jnp.float32)
        sy = (iy - 1).astype(jnp.float32)
        sx = (ix - 1).astype(jnp.float32)
        hz = jnp.maximum(0.0, 1.0 - jnp.abs(dz_off - sz))
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(dy_off - sy))
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(dx_off - sx))
        # d hat(d−s)/dd = −sign(d−s) where hat > 0 (matches
        # _sign_dhats / the XLA VJP exactly)
        dhz = -jnp.sign(dz_off - sz) * (hz > 0)
        dhy = -jnp.sign(dy_off - sy) * (hy > 0)
        dhx = -jnp.sign(dx_off - sx) * (hx > 0)
        xs = xt_ref[pl.ds(bz + iz, TZ), pl.ds(by + iy, TY),
                    pl.ds(bx + ix, TX), :]
        a_zy = hz * hy
        w1 = (a_zy * hx)[..., None]
        samp = samp + w1 * xs
        az = az + (dhz * hy * hx)[..., None] * xs
        ay = ay + (hz * dhy * hx)[..., None] * xs
        ax = ax + (a_zy * dhx)[..., None] * xs
        # dx push: canvas[p + tap + s] += hat · dsamp — the canvas is
        # this tile's PADDED dx block, resident in VMEM across all
        # 27 taps
        u = w1 * dsamp
        zsl = pl.ds(bz + iz, TZ)
        ysl = pl.ds(by + iy, TY)
        xsl = pl.ds(bx + ix, TX)
        dxc_ref[zsl, ysl, xsl, :] = dxc_ref[zsl, ysl, xsl, :] + u
        return samp, az, ay, ax

    zeros = jnp.zeros(wide, jnp.float32)
    samp, az, ay, ax = jax.lax.fori_loop(
        0, 27, win_body, (zeros, zeros, zeros, zeros))

    doff_ref[0] = jnp.sum(dsamp * az, axis=-1)
    doff_ref[1] = jnp.sum(dsamp * ay, axis=-1)
    doff_ref[2] = jnp.sum(dsamp * ax, axis=-1)
    # dw_k(ci, co) = Σ_p samp(p, ci) · g(p, co)
    dw_ref[0, 0] = jax.lax.dot_general(
        samp.reshape(TZ * TY * TX, C), g.reshape(TZ * TY * TX, C),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _overlap_add_axis(a, n, T, axis):
    """Overlap-add n tiles of width T+4 (halo 2 each side) along
    `axis` → one axis of length n·T. Boundary halos (tile 0 left,
    tile n−1 right) are gradients w.r.t. the zero padding — dropped.
    Three shifted adds; no serialized scatter."""
    a = jnp.moveaxis(a, (axis, axis + 1), (0, 1))  # (n, T+4, ...)
    core = a[:, 2:T + 2]
    left = a[1:, 0:2]    # lands at tail of the PREVIOUS tile
    right = a[:-1, T + 2:T + 4]  # lands at head of the NEXT tile
    rest = core.shape[2:]
    lc = jnp.concatenate([
        jnp.zeros((n - 1, T - 2) + rest, a.dtype), left], axis=1)
    lc = jnp.concatenate([lc, jnp.zeros((1, T) + rest, a.dtype)],
                         axis=0)
    rc = jnp.concatenate([
        right, jnp.zeros((n - 1, T - 2) + rest, a.dtype)], axis=1)
    rc = jnp.concatenate([jnp.zeros((1, T) + rest, a.dtype), rc],
                         axis=0)
    out = (core + lc + rc).reshape((n * T,) + rest)
    return jnp.moveaxis(out, 0, axis)


def bwd_supported(kd, kh, kw, stride, padding, dilation, groups, C,
                  cout, spatial=None) -> bool:
    """Eligibility mirror of the forward `pallas_supported`, narrowed
    to the R=1 training fast branch this kernel implements."""
    from deformablelka_tpu.ops.convs import _tuple as _t
    if (kd, kh, kw) != (3, 3, 3) or groups != 1 or C != cout:
        return False
    if tuple(_t(stride, 3)) != (1, 1, 1):
        return False
    if tuple(_t(padding, 3)) != (1, 1, 1):
        return False
    if tuple(_t(dilation, 3)) != (1, 1, 1):
        return False
    if C > 128:
        return False
    if spatial is not None:
        if not all(_tile_of(int(s)) >= 4 for s in spatial):
            return False
    return True


@functools.partial(jax.jit, static_argnames=("interpret",))
def deform_conv3d_window_bwd_pallas(x, offset, w, g,
                                    interpret: bool = False):
    """Gradients (dx, doff_clipped, dw) of the R=1 window deform conv.

    x: (B,D,H,W,C) · offset: (B,D,H,W,81) raw (clipped in-kernel) ·
    w: (3,3,3,C,C) · g: (B,D,H,W,C) upstream cotangent. The caller
    applies the clip straight-through mask to doff (this function
    returns the gradient w.r.t. the CLIPPED offsets).
    """
    B, D, H, W, C = x.shape
    m = 2
    TZ = _tile_of(D, MAX_TILE_Z) if D > MAX_TILE else _tile_of(D)
    TY, TX = _tile_of(H), _tile_of(W)
    n_z, n_y, n_x = D // TZ, H // TY, W // TX
    n_t = n_z * n_y * n_x
    nbt = B * n_t

    xp = jnp.pad(x, ((0, 0), (m, m), (m, m), (m, m), (0, 0))
                 ).astype(jnp.float32)
    x_tiles = jax.vmap(
        lambda v: _make_tiles(v, D, H, W, TZ, TY, TX, m))(xp)
    x_tiles = x_tiles.reshape(nbt * (TZ + 2 * m), TY + 2 * m,
                              TX + 2 * m, C)

    gt = g.astype(jnp.float32).reshape(B, n_z, TZ, n_y, TY, n_x, TX, C)
    gt = jnp.transpose(gt, (0, 1, 3, 5, 2, 4, 6, 7)).reshape(
        nbt * TZ, TY, TX, C)

    off_all = jnp.transpose(
        offset.astype(jnp.float32).reshape(B, D, H, W, 27, 3),
        (0, 4, 5, 1, 2, 3))
    o = off_all.reshape(B, 27, 3, n_z, TZ, n_y, TY, n_x, TX)
    o = jnp.transpose(o, (1, 0, 3, 5, 7, 2, 4, 6, 8))
    o = o.reshape(27 * nbt * 3, TZ, TY, TX)

    w_k3 = w.reshape(27, C, C).astype(jnp.float32)

    kern = functools.partial(_bwd_kernel, TZ=TZ, TY=TY, TX=TX, C=C)
    limit_mb = int(os.environ.get("DLKA_PALLAS_VMEM_LIMIT_MB", "64"))
    dxc, doff_t, dw_part = pl.pallas_call(
        kern,
        grid=(nbt, 27),
        in_specs=[
            pl.BlockSpec((3, TZ, TY, TX),
                         lambda t, k, nbt=nbt: (k * nbt + t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TZ + 2 * m, TY + 2 * m, TX + 2 * m, C),
                         lambda t, k: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TZ, TY, TX, C), lambda t, k: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, C), lambda t, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TZ + 2 * m, TY + 2 * m, TX + 2 * m, C),
                         lambda t, k: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TZ, TY, TX),
                         lambda t, k, nbt=nbt: (k * nbt + t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C, C), lambda t, k: (k, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nbt * (TZ + 2 * m), TY + 2 * m,
                                  TX + 2 * m, C), jnp.float32),
            jax.ShapeDtypeStruct((27 * nbt * 3, TZ, TY, TX),
                                 jnp.float32),
            jax.ShapeDtypeStruct((27, nbt, C, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=limit_mb * 1024 * 1024),
        interpret=interpret,
    )(o, x_tiles, gt, w_k3)

    # dx: per-tile padded canvases → overlap-add each axis (boundary
    # halos — gradients w.r.t. the zero padding — drop inside)
    dxc = dxc.reshape(B, n_z, n_y, n_x, TZ + 2 * m, TY + 2 * m,
                      TX + 2 * m, C)
    dxc = jnp.transpose(dxc, (0, 1, 4, 2, 5, 3, 6, 7))
    dxc = _overlap_add_axis(dxc, n_z, TZ, 1)    # (B, D', ny, TY', ...)
    dxc = _overlap_add_axis(dxc, n_y, TY, 2)
    dxc = _overlap_add_axis(dxc, n_x, TX, 3)
    dx = dxc.astype(x.dtype)

    doff_t = doff_t.reshape(27, B, n_z, n_y, n_x, 3, TZ, TY, TX)
    doff_t = jnp.transpose(doff_t, (1, 2, 6, 3, 7, 4, 8, 0, 5))
    doff = doff_t.reshape(B, D, H, W, 81).astype(offset.dtype)

    dw = jnp.sum(dw_part, axis=1).reshape(3, 3, 3, C, C).astype(w.dtype)
    return dx, doff, dw
