"""Pallas TPU kernel: 3D deformable convolution (3³, stride 1, dil 1).

This is the framework's replacement for the reference's only native
compute kernel — the D3D CUDA extension
(/root/reference/3D/dcn/src/cuda/deform_im2col_cuda.cuh:192-265:
per-thread trilinear gather + grouped GEMM). A TPU has no efficient
gather (XLA lowers it element-serialised, ~0.1 GB/s measured), so the
kernel uses the dense-window formulation (see ops/deform3d
.deform_conv3d_window): for every tap k with LOCAL offset Δ_k (clipped
to ±R),

    sample_k(p) = Σ_{s∈[-R,R+1]³} Π_ax hat(Δ_k,ax(p) − s_ax) · x(p+s)

where every x(p+s) is a STATIC slice of a VMEM-resident slab — pure VPU
FMAs — and the per-tap channel mixing Σ_ci sample_k(p,ci)·w_k(ci,co)
runs on the MXU. The whole computation reads x from HBM exactly once
per slab (async DMA with halo), which the XLA versions of this op
cannot achieve (each window term materialises an HBM-sized
intermediate).

Scope (everything the published 3D models need —
transformerblock.py:634-652): kernel 3×3×3, stride 1, dilation 1,
padding 1, groups=1. The dispatcher falls back to the XLA paths for
anything else. Backward: custom VJP delegating to the XLA window path's
autodiff (training-step parity; the forward hot loop is inference).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


MAX_TILE = 16       # largest (H, W) tile the backend compiles
MAX_TILE_Z = 8      # z-tiles of 16 with >1 z-step miscompile remotely
MAX_CHANNELS = 128  # C=256 fails to compile remotely; XLA fallback


def _tile_of(n: int, cap: int = MAX_TILE) -> int:
    """Largest divisor of n that is ≤ cap."""
    t = min(n, cap)
    while n % t:
        t -= 1
    return t


def pallas_supported(kd, kh, kw, stride, padding, dilation, groups, C,
                     cout, spatial=None) -> bool:
    from deformablelka_tpu.ops.convs import _tuple
    ok = (jax.default_backend() in ("tpu", "axon")
          and (kd, kh, kw) == (3, 3, 3)
          and tuple(_tuple(stride, 3)) == (1, 1, 1)
          and tuple(_tuple(padding, 3)) == (1, 1, 1)
          and tuple(_tuple(dilation, 3)) == (1, 1, 1)
          and groups == 1 and C == cout and C <= MAX_CHANNELS)
    if ok and spatial is not None:
        ok = all(_tile_of(int(s)) >= 4 for s in spatial)
    return ok


def _sample_kernel(off_ref, xt_ref, out_ref, *, TZ, TY, TX, C, R, m):
    """One grid step = one (tap, spatial tile): the dense-window
    trilinear sample field for tap k over a (TZ, TY, TX) tile.

    Backend constraints discovered by bisection (remote Mosaic):
      - no dynamic ref indexing whose value crosses a nested fori, and
        no dot fed by a nested-fori carry → the tap index is a GRID
        dimension and the channel mixing is one MXU einsum OUTSIDE;
      - tiles larger than 16 in H/W, C > 128, or bf16 blocks fail to
        compile → everything arrives as f32 tiles ≤ 16³ with halos
        pre-sliced in XLA.

    off_ref: (3, TZ, TY, TX) VMEM f32 — (Δd, Δh, Δw) for THIS tap/tile.
    xt_ref:  (TZ+2m, TY+2m, TX+2m, C) VMEM f32 — tile with halo m.
    out_ref: (TZ, TY, TX, C) VMEM block.
    """
    k = pl.program_id(0)
    bz = k // 9 - 1
    by = (k // 3) % 3 - 1
    bx = k % 3 - 1
    span = 2 * R + 2  # window s ∈ [-R, R+1]

    def win_body(widx, samp):
        dz = jnp.clip(off_ref[0], -R, R)
        dy = jnp.clip(off_ref[1], -R, R)
        dx = jnp.clip(off_ref[2], -R, R)
        sz = widx // (span * span) - R
        sy = (widx // span) % span - R
        sx = widx % span - R
        wgt = (jnp.maximum(0.0, 1.0 - jnp.abs(dz - sz))
               * jnp.maximum(0.0, 1.0 - jnp.abs(dy - sy))
               * jnp.maximum(0.0, 1.0 - jnp.abs(dx - sx)))
        xs = xt_ref[pl.ds(m + bz + sz, TZ),
                    pl.ds(m + by + sy, TY),
                    pl.ds(m + bx + sx, TX), :]
        return samp + wgt[..., None] * xs

    samp = jax.lax.fori_loop(0, span ** 3, win_body,
                             jnp.zeros((TZ, TY, TX, C), jnp.float32))
    out_ref[...] = samp


def _make_tiles(xp, D, H, W, TZ, TY, TX, m):
    """Overlapping (T+2m)³ tiles of the padded volume, flattened on
    dim 0 so 4D BlockSpecs can index them: (n_t·(TZ+2m), TY+2m,
    TX+2m, C)."""
    tiles = []
    for z in range(D // TZ):
        for y in range(H // TY):
            for xx in range(W // TX):
                t = jax.lax.slice(
                    xp,
                    (z * TZ, y * TY, xx * TX, 0),
                    (z * TZ + TZ + 2 * m, y * TY + TY + 2 * m,
                     xx * TX + TX + 2 * m, xp.shape[-1]))
                tiles.append(t)
    return jnp.concatenate(tiles, axis=0)


def _forward(x, offset, w, radius: int, interpret: bool = False):
    """x: (B, D, H, W, C); offset: (B, D, H, W, 81); w: (3,3,3,C,C)."""
    B, D, H, W, C = x.shape
    R = radius
    m = R + 2  # window R+1 plus tap base 1
    TZ = _tile_of(D, MAX_TILE_Z) if D > MAX_TILE else _tile_of(D)
    TY, TX = _tile_of(H), _tile_of(W)
    n_z, n_y, n_x = D // TZ, H // TY, W // TX
    n_t = n_z * n_y * n_x

    xp_all = jnp.pad(x, ((0, 0), (m, m), (m, m), (m, m), (0, 0))
                     ).astype(jnp.float32)
    # (B, 27, 3, D, H, W) → per-tile blocks (27·n_t·3, TZ, TY, TX)
    off_all = jnp.transpose(
        offset.reshape(B, D, H, W, 27, 3),
        (0, 4, 5, 1, 2, 3)).astype(jnp.float32)
    w_k = w.reshape(27 * C, C)

    kern = functools.partial(_sample_kernel, TZ=TZ, TY=TY, TX=TX, C=C,
                             R=R, m=m)
    flops = D * H * W * C * 27 * 2 * (2 * (R + 1)) ** 3

    def one_batch(args):
        off, xp = args
        # offsets tiled: (27, 3, nz, TZ, ny, TY, nx, TX) →
        # (27, n_t, 3, TZ, TY, TX) → flat dim0
        o = off.reshape(27, 3, n_z, TZ, n_y, TY, n_x, TX)
        o = jnp.transpose(o, (0, 2, 4, 6, 1, 3, 5, 7))
        o = o.reshape(27 * n_t * 3, TZ, TY, TX)
        tiles = _make_tiles(xp, D, H, W, TZ, TY, TX, m)
        samp = pl.pallas_call(
            kern,
            grid=(27, n_t),
            in_specs=[
                pl.BlockSpec((3, TZ, TY, TX),
                             lambda k, t: (k * n_t + t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TZ + 2 * m, TY + 2 * m, TX + 2 * m, C),
                             lambda k, t: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TZ, TY, TX, C),
                                   lambda k, t: (k * n_t + t, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((27 * n_t * TZ, TY, TX, C),
                                           jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=27 * xp.size * 4,
                transcendentals=0),
            interpret=interpret,
        )(o, tiles)
        # reassemble tiles → (27, D*H*W, C), then ONE MXU GEMM
        s = samp.reshape(27, n_z, n_y, n_x, TZ, TY, TX, C)
        s = jnp.transpose(s, (0, 1, 4, 2, 5, 3, 6, 7))
        s = s.reshape(27, D * H * W, C)
        s = jnp.moveaxis(s, 0, 1).reshape(D * H * W, 27 * C)
        out = jnp.dot(s, w_k.astype(s.dtype),
                      preferred_element_type=jnp.float32)
        return out.reshape(D, H, W, C).astype(x.dtype)

    if B == 1:
        return one_batch((off_all[0], xp_all[0]))[None]
    return jax.lax.map(one_batch, (off_all, xp_all))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def deform_conv3d_pallas(x, offset, w, radius: int = 2,
                         interpret: bool = False):
    """Deformable 3³ conv (stride 1, dil 1, pad 1, groups 1) on TPU."""
    return _forward(x, offset, w, radius, interpret)


def _fwd(x, offset, w, radius, interpret):
    return _forward(x, offset, w, radius, interpret), (x, offset, w)


def _bwd(radius, interpret, res, g):
    from deformablelka_tpu.ops.deform3d import deform_conv3d_window
    x, offset, w = res

    def f(x, offset, w):
        return deform_conv3d_window(x, offset, w, None, stride=1,
                                    padding=1, dilation=1, groups=1,
                                    radius=radius)

    _, vjp = jax.vjp(f, x, offset, w)
    return vjp(g)


deform_conv3d_pallas.defvjp(_fwd, _bwd)
