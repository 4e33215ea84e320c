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
    span = 2 * R + 1  # window s ∈ [-R, R]; the R+1 corner carries
    # weight 0 for clipped offsets (see deform3d.deform_conv3d_window)

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


def _sample_kernel_v2(off_ref, xt_ref, out_ref, *, TZ, TY, TX, C, R, m,
                      F):
    """Lane-packed dense-window sampler (v2). Three optimisations over
    `_sample_kernel`:

    1. **Per-axis hat precompute**: hz/hy hats are built once per tap
       (span arrays each) instead of recomputing clip+|·|+max for all
       three axes inside every window term.
    2. **W-packing**: the input tile arrives with F consecutive
       W-shifted copies folded into the lane dim (F·C ≤ 128 lanes), so
       one FMA covers F window x-shifts — at C=32/F=4 the VPU lanes go
       from 25 % to 100 % utilised.
    3. **Σ-then-multiply**: the x-axis hat weights are independent of
       (sz, sy), so the kernel accumulates U_p = Σ_{sz,sy} hz·hy·x_p
       per x-pack first and multiplies by the packed hx ONCE, halving
       the per-term op count.

    off_ref: (3, TZ, TY, TX); xt_ref: (TZ+2m, TY+2m, TX+2m, F·C) packed
    halo tile (lane g·C+c = x at w+g); out_ref: (TZ, TY, TX, C).
    """
    span = 2 * R + 1  # s ∈ [-R, R] (±(R+1) corners are zero-weight)
    n_packs = (span + F - 1) // F
    k = pl.program_id(0)
    bz = k // 9 - 1
    by = (k // 3) % 3 - 1
    bx = k % 3 - 1

    # packed x-hats: lane group g of pack p is window shift s = pF+g−R;
    # groups beyond the span get hat 0 (they fall outside the window).
    # The (sz, sy) window runs as a fori (a full static unroll fails
    # the remote Mosaic compile at this size; every piece compiles —
    # only the 16-term unrolled combination does not).
    lane_g = jax.lax.broadcasted_iota(jnp.int32, (TZ, TY, TX, F * C),
                                      3) // C
    sample = None
    for p in range(n_packs):
        dx = jnp.clip(off_ref[2], -R, R)
        s_of_lane = (lane_g + p * F).astype(jnp.float32) - R
        hxp = jnp.maximum(0.0, 1.0 - jnp.abs(dx[..., None] - s_of_lane))
        hxp = jnp.where(lane_g + p * F < span, hxp, 0.0)

        dz = jnp.clip(off_ref[0], -R, R)
        dy = jnp.clip(off_ref[1], -R, R)

        def zy_body(widx, acc, p=p, dz=dz, dy=dy):
            sz = widx // span
            sy = widx % span
            w2 = (jnp.maximum(0.0, 1.0 - jnp.abs(dz - (sz - R)))
                  * jnp.maximum(0.0, 1.0 - jnp.abs(dy - (sy - R))))
            xs = xt_ref[pl.ds(m + bz + sz - R, TZ),
                        pl.ds(m + by + sy - R, TY),
                        pl.ds(m + bx + p * F - R, TX), :]
            return acc + w2[..., None] * xs

        acc = jax.lax.fori_loop(
            0, span * span, zy_body,
            jnp.zeros((TZ, TY, TX, F * C), jnp.float32))
        contrib = hxp * acc
        sample = contrib if sample is None else sample + contrib
    out = sample[..., 0:C]
    for g in range(1, F):
        out = out + sample[..., g * C:(g + 1) * C]
    out_ref[...] = out


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
    m = R + 1  # window R plus tap base 1
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


def _forward_v2(x, offset, w, radius: int, interpret: bool = False):
    """Lane-packed forward (see `_sample_kernel_v2`).

    x: (B, D, H, W, C); offset: (B, D, H, W, 81); w: (3,3,3,C,C)."""
    B, D, H, W, C = x.shape
    R = radius
    m = R + 1  # window R plus tap base 1
    F = next(f for f in (4, 2, 1) if f * C <= 128)
    TZ = _tile_of(D, MAX_TILE_Z) if D > MAX_TILE else _tile_of(D)
    TY, TX = _tile_of(H), _tile_of(W)
    n_z, n_y, n_x = D // TZ, H // TY, W // TX
    n_t = n_z * n_y * n_x

    xp = jnp.pad(x, ((0, 0), (m, m), (m, m), (m, m + F - 1), (0, 0))
                 ).astype(jnp.float32)
    # fold F W-shifted copies into the lane dim: xp4[..., w, g*C+c]
    # = xp[..., w+g, c]
    xp4 = jnp.concatenate(
        [jax.lax.slice_in_dim(xp, g, g + W + 2 * m, axis=3)
         for g in range(F)], axis=-1)
    off_all = jnp.transpose(
        offset.reshape(B, D, H, W, 27, 3),
        (0, 4, 5, 1, 2, 3)).astype(jnp.float32)
    w_k = w.reshape(27 * C, C)

    kern = functools.partial(_sample_kernel_v2, TZ=TZ, TY=TY, TX=TX,
                             C=C, R=R, m=m, F=F)
    span = 2 * R + 1
    n_packs = (span + F - 1) // F
    flops = D * H * W * F * C * 27 * 2 * (span * span * n_packs + 2)

    def one_batch(args):
        off, xp4b = args
        o = off.reshape(27, 3, n_z, TZ, n_y, TY, n_x, TX)
        o = jnp.transpose(o, (0, 2, 4, 6, 1, 3, 5, 7))
        o = o.reshape(27 * n_t * 3, TZ, TY, TX)
        tiles = _make_tiles(xp4b, D, H, W, TZ, TY, TX, m)
        samp = pl.pallas_call(
            kern,
            grid=(27, n_t),
            in_specs=[
                pl.BlockSpec((3, TZ, TY, TX),
                             lambda k, t: (k * n_t + t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TZ + 2 * m, TY + 2 * m, TX + 2 * m, F * C),
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
                bytes_accessed=27 * xp4b.size * 4,
                transcendentals=0),
            interpret=interpret,
        )(o, tiles)
        s = samp.reshape(27, n_z, n_y, n_x, TZ, TY, TX, C)
        s = jnp.transpose(s, (0, 1, 4, 2, 5, 3, 6, 7))
        s = s.reshape(27, D * H * W, C)
        s = jnp.moveaxis(s, 0, 1).reshape(D * H * W, 27 * C)
        out = jnp.dot(s, w_k.astype(s.dtype),
                      preferred_element_type=jnp.float32)
        return out.reshape(D, H, W, C).astype(x.dtype)

    if B == 1:
        return one_batch((off_all[0], xp4[0]))[None]
    return jax.lax.map(one_batch, (off_all, xp4))


def _sample_dot_kernel_v3(off_ref, xt_ref, w_ref, out_ref, *, TZ, TY,
                          TX, C, R, m, F):
    """v3: tap-inner grid + in-kernel MXU channel mixing.

    Two structural fixes over v2, bisected+measured on-device
    (benchmarks/probe_deform_v3*.py, PERF.md "deform kernel v3"):

    1. **Grid (n_t, taps)** with the x-tile BlockSpec independent of
       the tap index: consecutive tap steps reuse the resident VMEM
       block instead of re-DMA-ing every tile 27× (~430 MB of HBM
       reads per stage-0 call under the v2 grid).
    2. **Per-tap dot accumulated in-kernel** into a single resident
       output block: the 27× f32 sampled volume (108 MB at stage-0)
       never exists and the separate XLA GEMM + transpose disappear.
       The bisected constraint "no dot fed by a nested-fori carry"
       does not bite because the zy window here is a 9-term STATIC
       unroll with per-axis hats precomputed once per tap (a fori
       carry into the dot also compiled, but measured slower).

    Requires span=2R+1 ≤ F (single x-pack), i.e. R=1 with C ≤ 32.
    Measured in-program at stage-0 (32³, C32, R1): 5.1 ms vs 7.15 for
    the XLA window and 8.5 for v2 — with bit-identical (f32-exact)
    sampling semantics.
    """
    span = 2 * R + 1
    k = pl.program_id(1)
    bz = k // 9 - 1
    by = (k // 3) % 3 - 1
    bx = k % 3 - 1

    lane_g = jax.lax.broadcasted_iota(jnp.int32, (TZ, TY, TX, F * C),
                                      3) // C
    dx = jnp.clip(off_ref[2], -R, R)
    s_of_lane = lane_g.astype(jnp.float32) - R
    hxp = jnp.maximum(0.0, 1.0 - jnp.abs(dx[..., None] - s_of_lane))
    hxp = jnp.where(lane_g < span, hxp, 0.0)
    dz = jnp.clip(off_ref[0], -R, R)
    dy = jnp.clip(off_ref[1], -R, R)

    hz = [jnp.maximum(0.0, 1.0 - jnp.abs(dz - s))
          for s in range(-R, R + 1)]
    hy = [jnp.maximum(0.0, 1.0 - jnp.abs(dy - s))
          for s in range(-R, R + 1)]
    acc = jnp.zeros((TZ, TY, TX, F * C), jnp.float32)
    for sz in range(span):
        for sy in range(span):
            w2 = hz[sz] * hy[sy]
            xs = xt_ref[pl.ds(m + bz + sz - R, TZ),
                        pl.ds(m + by + sy - R, TY),
                        pl.ds(m + bx - R, TX), :]
            acc = acc + w2[..., None] * xs

    sample = hxp * acc
    samp = sample[..., 0:C]
    for g in range(1, F):
        samp = samp + sample[..., g * C:(g + 1) * C]
    contrib = jax.lax.dot_general(
        samp.reshape(TZ * TY * TX, C), w_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(TZ, TY, TX, C)

    @pl.when(k == 0)
    def _():
        out_ref[...] = contrib

    @pl.when(k > 0)
    def _():
        out_ref[...] = out_ref[...] + contrib


def _relu_hats(d, R):
    """Per-shift hat weights for a CLIPPED offset |d| ≤ R, R=1, via
    relu identities (4 wide ops instead of ~9 abs/sub/max per axis):
    hat(d−(−1))=relu(−d), hat(d−1)=relu(d), hat(d)=1−both."""
    if R != 1:  # pragma: no cover - only R=1 kernels call this
        return [jnp.maximum(0.0, 1.0 - jnp.abs(d - s))
                for s in range(-R, R + 1)]
    hm = jnp.maximum(0.0, -d)
    hp = jnp.maximum(0.0, d)
    return [hm, 1.0 - hm - hp, hp]


def _sample_dot_kernel_v4(off_ref, xt_ref, w_ref, out_ref, *, TZ, TY,
                          TX, C, R, m, F):
    """v4 = v3 with factored FULL-WIDTH hats (2 broadcasts per tap).

    The v3 kernel's cost was dissected on-device
    (benchmarks/probe_deform_dissect.py): with constant window weights
    the kernel runs 1.07 ms at stage-0, with the real hats 5.2 ms —
    the 9 per-window-term sublane→lane broadcasts of the C-free hat
    products (`w2[..., None] * xs`) own ~80 % of the runtime, not the
    FMAs or the MXU dot. v4 broadcasts dz/dy to lane width ONCE each
    and evaluates the hat functions full-width, so the 9-term window
    becomes pure full-width FMAs: measured 2.3 ms vs 5.2 at stage-0
    (benchmarks/probe_deform_v5.py mode `v5a`, exact parity). The
    nested-difference form (4 broadcasts, fewer FMAs) measured 3.0 ms
    — more FMA-class ops beat more broadcasts on this VPU.

    Hats are built via the relu identities exact for clipped |d| ≤ 1
    (R=1): hat(d+1)=relu(−d), hat(d−1)=relu(d), hat(d)=1−both — 4 wide
    ops per axis instead of ~9 (probe_deform_v6 `v4r`: 2.20 vs 2.29).
    """
    span = 2 * R + 1
    k = pl.program_id(1)
    bz = k // 9 - 1
    by = (k // 3) % 3 - 1
    bx = k % 3 - 1

    lane_g = jax.lax.broadcasted_iota(jnp.int32, (TZ, TY, TX, F * C),
                                      3) // C
    dx = jnp.clip(off_ref[2], -R, R)
    s_of_lane = lane_g.astype(jnp.float32) - R
    hxp = jnp.maximum(0.0, 1.0 - jnp.abs(dx[..., None] - s_of_lane))
    hxp = jnp.where(lane_g < span, hxp, 0.0)
    wide = (TZ, TY, TX, F * C)
    hz = _relu_hats(jnp.broadcast_to(
        jnp.clip(off_ref[0], -R, R)[..., None], wide), R)
    hy = _relu_hats(jnp.broadcast_to(
        jnp.clip(off_ref[1], -R, R)[..., None], wide), R)

    acc = jnp.zeros(wide, jnp.float32)
    for sz in range(span):
        t = jnp.zeros(wide, jnp.float32)
        for sy in range(span):
            xs = xt_ref[pl.ds(m + bz + sz - R, TZ),
                        pl.ds(m + by + sy - R, TY),
                        pl.ds(m + bx - R, TX), :]
            t = t + hy[sy] * xs
        acc = acc + hz[sz] * t

    sample = hxp * acc
    samp = sample[..., 0:C]
    for g in range(1, F):
        samp = samp + sample[..., g * C:(g + 1) * C]
    contrib = jax.lax.dot_general(
        samp.reshape(TZ * TY * TX, C), w_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(TZ, TY, TX, C)

    @pl.when(k == 0)
    def _():
        out_ref[...] = contrib

    @pl.when(k > 0)
    def _():
        out_ref[...] = out_ref[...] + contrib


def _sample_dot_kernel_v4w(off_ref, xt_ref, w_ref, out_ref, *, TZ, TY,
                           TX, C, R, m, F):
    """v4w: the v4 structure (tap-inner grid, factored full-width
    hats, in-kernel MXU dot) generalised past span ≤ F by iterating
    n_packs = ceil(span/F) x-packs — C=64 runs 2 packs of 2 lanes-
    groups, C=128 runs 3 packs of 1. Each pack reuses the SAME
    full-width hz/hy hats; only the packed x-hat and the x base of
    the slab reads differ. Extends the pallas fast branch to stages
    1-2 (16³ C64, 8³ C128) which previously fell back to the XLA
    window path (VERDICT r2 item 1a)."""
    span = 2 * R + 1
    n_packs = (span + F - 1) // F
    k = pl.program_id(1)
    bz = k // 9 - 1
    by = (k // 3) % 3 - 1
    bx = k % 3 - 1

    lane_g = jax.lax.broadcasted_iota(jnp.int32, (TZ, TY, TX, F * C),
                                      3) // C
    dx = jnp.clip(off_ref[2], -R, R)
    wide = (TZ, TY, TX, F * C)
    hz = _relu_hats(jnp.broadcast_to(
        jnp.clip(off_ref[0], -R, R)[..., None], wide), R)
    hy = _relu_hats(jnp.broadcast_to(
        jnp.clip(off_ref[1], -R, R)[..., None], wide), R)

    sample = None
    for p in range(n_packs):
        s_of_lane = (lane_g + p * F).astype(jnp.float32) - R
        hxp = jnp.maximum(0.0, 1.0 - jnp.abs(dx[..., None] - s_of_lane))
        hxp = jnp.where(lane_g + p * F < span, hxp, 0.0)
        acc = jnp.zeros(wide, jnp.float32)
        for sz in range(span):
            t = jnp.zeros(wide, jnp.float32)
            for sy in range(span):
                xs = xt_ref[pl.ds(m + bz + sz - R, TZ),
                            pl.ds(m + by + sy - R, TY),
                            pl.ds(m + bx + p * F - R, TX), :]
                t = t + hy[sy] * xs
            acc = acc + hz[sz] * t
        contrib = hxp * acc
        sample = contrib if sample is None else sample + contrib

    samp = sample[..., 0:C]
    for g in range(1, F):
        samp = samp + sample[..., g * C:(g + 1) * C]
    contrib = jax.lax.dot_general(
        samp.reshape(TZ * TY * TX, C), w_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(TZ, TY, TX, C)

    @pl.when(k == 0)
    def _():
        out_ref[...] = contrib

    @pl.when(k > 0)
    def _():
        out_ref[...] = out_ref[...] + contrib


def _sample_dot_kernel_v5(off_ref, xt_ref, w_ref, out_ref, *, TZ, TY,
                          TX, C, R, m, F):
    """v5 = v4 with the offset planes LANE-packed.

    v4's remaining hat-build cost is the sublane→lane RELAYOUT hidden in
    `broadcast_to(off_ref[i][..., None], wide)` — off_ref is
    (3, TZ, TY, TX) so TX lives in lanes and the broadcast must move it
    to sublanes first (a transpose-class Mosaic op) before splatting.
    v5 receives offsets as (TZ, TY, TX, 3) — planes in the LANE dim —
    so `off_ref[:, :, :, i:i+1]` is a static lane slice and the splat
    to F·C lanes is a pure lane broadcast. Bit-exact vs v4; stage-0
    in-program 2.21 → 1.94 ms (probe_deform_v5s, 2026-08-19). The
    sublane-folded (n_hat·TZ, TY, TX, 1) and 5-D (n_hat, TZ, TY, TX, 1)
    layouts both HTTP-500 the remote compiler (bisected same session;
    the minimal splat pieces compile — the combination doesn't).
    """
    span = 2 * R + 1
    k = pl.program_id(1)
    bz = k // 9 - 1
    by = (k // 3) % 3 - 1
    bx = k % 3 - 1
    wide = (TZ, TY, TX, F * C)

    def splat(i):
        return jnp.broadcast_to(
            jnp.clip(off_ref[:, :, :, i:i + 1], -R, R), wide)

    lane_g = jax.lax.broadcasted_iota(jnp.int32, wide, 3) // C
    s_of_lane = lane_g.astype(jnp.float32) - R
    hxp = jnp.maximum(0.0, 1.0 - jnp.abs(splat(2) - s_of_lane))
    hxp = jnp.where(lane_g < span, hxp, 0.0)
    hz = _relu_hats(splat(0), R)
    hy = _relu_hats(splat(1), R)

    acc = jnp.zeros(wide, jnp.float32)
    for sz in range(span):
        t = jnp.zeros(wide, jnp.float32)
        for sy in range(span):
            xs = xt_ref[pl.ds(m + bz + sz - R, TZ),
                        pl.ds(m + by + sy - R, TY),
                        pl.ds(m + bx - R, TX), :]
            t = t + hy[sy] * xs
        acc = acc + hz[sz] * t

    sample = hxp * acc
    samp = sample[..., 0:C]
    for g in range(1, F):
        samp = samp + sample[..., g * C:(g + 1) * C]
    contrib = jax.lax.dot_general(
        samp.reshape(TZ * TY * TX, C), w_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(TZ, TY, TX, C)

    @pl.when(k == 0)
    def _():
        out_ref[...] = contrib

    @pl.when(k > 0)
    def _():
        out_ref[...] = out_ref[...] + contrib


def _sample_dot_kernel_v5w(off_ref, xt_ref, w_ref, out_ref, *, TZ, TY,
                           TX, C, R, m, F):
    """v5w: the v4w multi-pack kernel with v5's lane-packed offsets."""
    span = 2 * R + 1
    n_packs = (span + F - 1) // F
    k = pl.program_id(1)
    bz = k // 9 - 1
    by = (k // 3) % 3 - 1
    bx = k % 3 - 1
    wide = (TZ, TY, TX, F * C)

    def splat(i):
        return jnp.broadcast_to(
            jnp.clip(off_ref[:, :, :, i:i + 1], -R, R), wide)

    lane_g = jax.lax.broadcasted_iota(jnp.int32, wide, 3) // C
    dx = splat(2)
    hz = _relu_hats(splat(0), R)
    hy = _relu_hats(splat(1), R)

    sample = None
    for p in range(n_packs):
        s_of_lane = (lane_g + p * F).astype(jnp.float32) - R
        hxp = jnp.maximum(0.0, 1.0 - jnp.abs(dx - s_of_lane))
        hxp = jnp.where(lane_g + p * F < span, hxp, 0.0)
        acc = jnp.zeros(wide, jnp.float32)
        for sz in range(span):
            t = jnp.zeros(wide, jnp.float32)
            for sy in range(span):
                xs = xt_ref[pl.ds(m + bz + sz - R, TZ),
                            pl.ds(m + by + sy - R, TY),
                            pl.ds(m + bx + p * F - R, TX), :]
                t = t + hy[sy] * xs
            acc = acc + hz[sz] * t
        contrib = hxp * acc
        sample = contrib if sample is None else sample + contrib

    samp = sample[..., 0:C]
    for g in range(1, F):
        samp = samp + sample[..., g * C:(g + 1) * C]
    contrib = jax.lax.dot_general(
        samp.reshape(TZ * TY * TX, C), w_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(TZ, TY, TX, C)

    @pl.when(k == 0)
    def _():
        out_ref[...] = contrib

    @pl.when(k > 0)
    def _():
        out_ref[...] = out_ref[...] + contrib


def _sample_dot_kernel_v5x(off_ref, xt_ref, w_ref, out_ref, *, TZ, TY,
                           TX, C, R, m, F):
    """v5x: v5's full-width-hat window with the offsets consumed IN
    PLACE — off_ref is the tile's WHOLE (TZ, TY, TX, 81) offset-conv
    output (channel 3k+i = tap k, axis i) and tap k's three planes are
    extracted by a masked LANE reduction (sum over lanes where
    lane == 3k+i). Mosaic rejects a (TZ, TY, TX, 3) block carved at
    lane offset 3k (last block dim must be 128-divisible or whole),
    so the whole-dim block + in-kernel extraction is the legal form;
    the BlockSpec index map ignores k, so the block stays VMEM-
    resident across the 27 tap steps like the x-tile. Removes the
    XLA-side offset relayout that made v4/v5 pay ~0.3-0.5 ms per call
    (the v5 model-level loss, PERF.md round-4 v5 gate)."""
    span = 2 * R + 1
    k = pl.program_id(1)
    bz = k // 9 - 1
    by = (k // 3) % 3 - 1
    bx = k % 3 - 1
    wide = (TZ, TY, TX, F * C)

    ob = off_ref[...]
    lane81 = jax.lax.broadcasted_iota(jnp.int32, ob.shape, 3)

    def splat(i):
        d = jnp.sum(jnp.where(lane81 == 3 * k + i, ob, 0.0),
                    axis=-1, keepdims=True)
        return jnp.broadcast_to(jnp.clip(d, -R, R), wide)

    lane_g = jax.lax.broadcasted_iota(jnp.int32, wide, 3) // C
    s_of_lane = lane_g.astype(jnp.float32) - R
    hxp = jnp.maximum(0.0, 1.0 - jnp.abs(splat(2) - s_of_lane))
    hxp = jnp.where(lane_g < span, hxp, 0.0)
    hz = _relu_hats(splat(0), R)
    hy = _relu_hats(splat(1), R)

    acc = jnp.zeros(wide, jnp.float32)
    for sz in range(span):
        t = jnp.zeros(wide, jnp.float32)
        for sy in range(span):
            xs = xt_ref[pl.ds(m + bz + sz - R, TZ),
                        pl.ds(m + by + sy - R, TY),
                        pl.ds(m + bx - R, TX), :]
            t = t + hy[sy] * xs
        acc = acc + hz[sz] * t

    sample = hxp * acc
    samp = sample[..., 0:C]
    for g in range(1, F):
        samp = samp + sample[..., g * C:(g + 1) * C]
    contrib = jax.lax.dot_general(
        samp.reshape(TZ * TY * TX, C), w_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(TZ, TY, TX, C)

    @pl.when(k == 0)
    def _():
        out_ref[...] = contrib

    @pl.when(k > 0)
    def _():
        out_ref[...] = out_ref[...] + contrib


def _sample_dot_kernel_v5xw(off_ref, xt_ref, w_ref, out_ref, *, TZ, TY,
                            TX, C, R, m, F):
    """v5xw: the v5w multi-pack kernel with v5x's in-place offsets."""
    span = 2 * R + 1
    n_packs = (span + F - 1) // F
    k = pl.program_id(1)
    bz = k // 9 - 1
    by = (k // 3) % 3 - 1
    bx = k % 3 - 1
    wide = (TZ, TY, TX, F * C)

    ob = off_ref[...]
    lane81 = jax.lax.broadcasted_iota(jnp.int32, ob.shape, 3)

    def splat(i):
        d = jnp.sum(jnp.where(lane81 == 3 * k + i, ob, 0.0),
                    axis=-1, keepdims=True)
        return jnp.broadcast_to(jnp.clip(d, -R, R), wide)

    lane_g = jax.lax.broadcasted_iota(jnp.int32, wide, 3) // C
    dx = splat(2)
    hz = _relu_hats(splat(0), R)
    hy = _relu_hats(splat(1), R)

    sample = None
    for p in range(n_packs):
        s_of_lane = (lane_g + p * F).astype(jnp.float32) - R
        hxp = jnp.maximum(0.0, 1.0 - jnp.abs(dx - s_of_lane))
        hxp = jnp.where(lane_g + p * F < span, hxp, 0.0)
        acc = jnp.zeros(wide, jnp.float32)
        for sz in range(span):
            t = jnp.zeros(wide, jnp.float32)
            for sy in range(span):
                xs = xt_ref[pl.ds(m + bz + sz - R, TZ),
                            pl.ds(m + by + sy - R, TY),
                            pl.ds(m + bx + p * F - R, TX), :]
                t = t + hy[sy] * xs
            acc = acc + hz[sz] * t
        contrib = hxp * acc
        sample = contrib if sample is None else sample + contrib

    samp = sample[..., 0:C]
    for g in range(1, F):
        samp = samp + sample[..., g * C:(g + 1) * C]
    contrib = jax.lax.dot_general(
        samp.reshape(TZ * TY * TX, C), w_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(TZ, TY, TX, C)

    @pl.when(k == 0)
    def _():
        out_ref[...] = contrib

    @pl.when(k > 0)
    def _():
        out_ref[...] = out_ref[...] + contrib


def _forward_v3(x, offset, w, radius: int, interpret: bool = False,
                kern_fn=_sample_dot_kernel_v3, off_inplace: bool = False):
    """Tap-inner + fused-dot forward (see `_sample_dot_kernel_v3`).

    x: (B, D, H, W, C); offset: (B, D, H, W, 81); w: (3,3,3,C,C)."""
    B, D, H, W, C = x.shape
    R = radius
    m = R + 1
    F = next(f for f in (4, 2, 1) if f * C <= 128)
    span = 2 * R + 1
    lane_off = kern_fn in (_sample_dot_kernel_v5, _sample_dot_kernel_v5w)
    assert (span <= F
            or kern_fn in (_sample_dot_kernel_v4w, _sample_dot_kernel_v5w,
                           _sample_dot_kernel_v5xw)), \
        ("v3/v4/v5/v5x require a single x-pack (R=1, C<=32); "
         "use v4w/v5w/v5xw beyond")
    TZ = _tile_of(D, MAX_TILE_Z) if D > MAX_TILE else _tile_of(D)
    TY, TX = _tile_of(H), _tile_of(W)
    n_z, n_y, n_x = D // TZ, H // TY, W // TX
    n_t = n_z * n_y * n_x

    # x-tile dtype: f32. Re-probed 2026-08-20 on v5x/v5xw
    # (benchmarks/probe_deform_bf16_r4.py): bf16 tile blocks STILL
    # HTTP-500 the remote Mosaic compiler (the v1-era bisect holds),
    # so the flag stays default-off. If the compiler ever accepts
    # them, bf16 tiles would halve the xp4 materialisation and the
    # per-call tile HBM read; in-kernel math stays f32 (bf16 xs
    # promote against the f32 hats).
    import os as _os
    tile_dt = (jnp.bfloat16
               if _os.environ.get("DLKA_PALLAS_BF16_TILES", "0") == "1"
               else jnp.float32)
    xp = jnp.pad(x, ((0, 0), (m, m), (m, m), (m, m + F - 1), (0, 0))
                 ).astype(tile_dt)
    xp4 = jnp.concatenate(
        [jax.lax.slice_in_dim(xp, g, g + W + 2 * m, axis=3)
         for g in range(F)], axis=-1)
    off_all = None
    if not off_inplace:
        off_all = jnp.transpose(
            offset.reshape(B, D, H, W, 27, 3),
            (0, 4, 5, 1, 2, 3)).astype(jnp.float32)
    w_k3 = w.reshape(27, C, C).astype(jnp.float32)
    kern = functools.partial(kern_fn, TZ=TZ, TY=TY,
                             TX=TX, C=C, R=R, m=m, F=F)
    flops = B * D * H * W * C * 27 * 2 * (F * (span * span + 2) + C)

    # BATCH-AWARE grid (B·n_t, 27): batch folds into the tile axis so
    # TTA/tile batching scales the one pallas_call instead of
    # serialising per-sample through lax.map. Tap k stays innermost —
    # consecutive taps reuse the VMEM-resident x-tile.
    nbt = B * n_t
    # offsets → (27, B, n_t, 3, TZ, TY, TX) → flat dim0 so block
    # (k, t=b·n_t+tt) lives at row k·nbt + t. v5-class kernels take the
    # planes LANE-packed instead: (27·nbt·TZ, TY, TX, 3).
    if off_inplace:
        # v5x: NO channel relayout at all. The offset conv's output
        # already carries (tap, axis) packed in the minor dim
        # (channel 3k+i = tap k, axis i — deform_conv.py:80-91 order).
        # The kernel receives the whole (TZ, TY, TX, 81) lane block
        # per tile — the index map below ignores k, so the block stays
        # VMEM-resident across all 27 tap steps — and extracts tap k's
        # 3 planes in-kernel with a masked lane reduction. (A 3-lane
        # BlockSpec carve at lane offset 3k was the first design;
        # Mosaic rejects non-aligned minor-dim blocks, hence the
        # whole-81-lane block + in-kernel extraction.) Host-side prep
        # is the same spatial tiling the x-tiles pay (identity when
        # n_t == B == 1), so the v5 kernel's lane-packed layout
        # becomes free — the model-level loss that kept v5 opt-in was
        # exactly this transpose (PERF.md round-4 v5 gate).
        o = offset.astype(jnp.float32).reshape(
            B, n_z, TZ, n_y, TY, n_x, TX, 81)
        o = jnp.transpose(o, (0, 1, 3, 5, 2, 4, 6, 7))
        o = o.reshape(nbt * TZ, TY, TX, 81)
        # whole-dim lane block (Mosaic rejects a 3-lane block at
        # offset 3k); index map ignores k so the block is VMEM-
        # resident across all 27 tap steps, like the x-tile.
        off_spec = pl.BlockSpec(
            (TZ, TY, TX, 81),
            lambda t, k: (t, 0, 0, 0),
            memory_space=pltpu.VMEM)
    elif lane_off:
        o = off_all.reshape(B, 27, 3, n_z, TZ, n_y, TY, n_x, TX)
        o = jnp.transpose(o, (1, 0, 3, 5, 7, 4, 6, 8, 2))
        o = o.reshape(27 * nbt * TZ, TY, TX, 3)
        off_spec = pl.BlockSpec(
            (TZ, TY, TX, 3),
            lambda t, k, nbt=nbt: (k * nbt + t, 0, 0, 0),
            memory_space=pltpu.VMEM)
    else:
        o = off_all.reshape(B, 27, 3, n_z, TZ, n_y, TY, n_x, TX)
        o = jnp.transpose(o, (1, 0, 3, 5, 7, 2, 4, 6, 8))
        o = o.reshape(27 * nbt * 3, TZ, TY, TX)
        off_spec = pl.BlockSpec(
            (3, TZ, TY, TX),
            lambda t, k, nbt=nbt: (k * nbt + t, 0, 0, 0),
            memory_space=pltpu.VMEM)
    tiles = jax.vmap(
        lambda v: _make_tiles(v, D, H, W, TZ, TY, TX, m))(xp4)
    tiles = tiles.reshape(nbt * (TZ + 2 * m), TY + 2 * m,
                          TX + 2 * m, F * C)
    # v5x's whole-81-lane offset block pushes the call's scoped VMEM
    # to 16.38 MB — 388 KB over XLA's default 16 MB scoped limit —
    # ONLY inside while-nested programs (the scan-mode sliding window;
    # bare forwards left enough headroom). Raise the per-call limit
    # for the in-place variants; physical VMEM on v5e is far above
    # the conservative default. Tunable via DLKA_PALLAS_VMEM_LIMIT_MB
    # (0 = leave XLA's default).
    limit_mb = int(_os.environ.get("DLKA_PALLAS_VMEM_LIMIT_MB",
                                   "32" if off_inplace else "0"))
    compiler_params = (pltpu.CompilerParams(
        vmem_limit_bytes=limit_mb * 1024 * 1024)
        if limit_mb else None)
    out = pl.pallas_call(
        kern,
        grid=(nbt, 27),
        compiler_params=compiler_params,
        in_specs=[
            off_spec,
            pl.BlockSpec((TZ + 2 * m, TY + 2 * m, TX + 2 * m,
                          F * C),
                         lambda t, k: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, C), lambda t, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TZ, TY, TX, C),
                               lambda t, k: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbt * TZ, TY, TX, C),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=tiles.size * tiles.dtype.itemsize + o.size * 4,
            transcendentals=0),
        interpret=interpret,
    )(o, tiles, w_k3)
    s = out.reshape(B, n_z, n_y, n_x, TZ, TY, TX, C)
    s = jnp.transpose(s, (0, 1, 4, 2, 5, 3, 6, 7))
    return s.reshape(B, D, H, W, C).astype(x.dtype)


def _forward_v4(x, offset, w, radius: int, interpret: bool = False):
    return _forward_v3(x, offset, w, radius, interpret,
                       kern_fn=_sample_dot_kernel_v4)


def _forward_v4w(x, offset, w, radius: int, interpret: bool = False):
    return _forward_v3(x, offset, w, radius, interpret,
                       kern_fn=_sample_dot_kernel_v4w)


def _forward_v5(x, offset, w, radius: int, interpret: bool = False):
    return _forward_v3(x, offset, w, radius, interpret,
                       kern_fn=_sample_dot_kernel_v5)


def _forward_v5w(x, offset, w, radius: int, interpret: bool = False):
    return _forward_v3(x, offset, w, radius, interpret,
                       kern_fn=_sample_dot_kernel_v5w)


def _forward_v5x(x, offset, w, radius: int, interpret: bool = False):
    return _forward_v3(x, offset, w, radius, interpret,
                       kern_fn=_sample_dot_kernel_v5x, off_inplace=True)


def _forward_v5xw(x, offset, w, radius: int, interpret: bool = False):
    return _forward_v3(x, offset, w, radius, interpret,
                       kern_fn=_sample_dot_kernel_v5xw, off_inplace=True)


def _kernel_version(radius: int, C: int) -> str:
    import os
    v = os.environ.get("DLKA_PALLAS_KERNEL", "auto")
    if v in ("v1", "v2", "v3", "v4", "v4w", "v5", "v5w", "v5x", "v5xw"):
        return v
    F = next((f for f in (4, 2, 1) if f * C <= 128), 0)
    if v in ("auto", "auto5x"):
        # DEFAULT since round 5 (2026-08-20), second attempt: v5x/v5xw
        # — the v5 full-width-hat kernel fed IN PLACE (whole-81-lane
        # offset block per tile, tap planes extracted by a masked lane
        # reduction in-kernel; the block spec ignores k so it stays
        # VMEM-resident across taps), with the pallas_call's scoped
        # VMEM limit raised to 32 MB (DLKA_PALLAS_VMEM_LIMIT_MB). The
        # round-4 flip of the same kernels shipped WITHOUT the limit
        # raise and broke the bench protocol (16.38 MB scoped alloc vs
        # the 16 MB default inside the while-nested sliding-window
        # scan; BENCH_r04 0.015 vol/s "ESTIMATED"). This flip is gated
        # on a full same-session `python bench.py` run per the new
        # rule: 0.2459 vol/s vs 0.2358 for v4 (PERF.md round-5 entry);
        # gate --model=bench 2-tile protocol 1186.6 vs 1251.7 ms/vol.
        # v4/v4w remains available via DLKA_PALLAS_KERNEL=auto4.
        if 2 * radius + 1 <= F:
            return "v5x"
        return "v5xw" if radius == 1 and C <= MAX_CHANNELS else "v2"
    if v == "auto5":
        # v5/v5w (lane-packed offsets): the KERNEL wins isolated
        # (stage-0 1.94 vs 2.21 ms, bit-exact) but the XLA-side
        # planes-last offset transpose costs more than the kernel
        # saves — model-level gate 2026-08-19: 65.8 vs 64.3 ms/fwd,
        # two interleaved passes. Superseded by v5x (the 'auto'
        # default), which gets the lane-packed layout without the
        # transpose; kept for A/B reference.
        if 2 * radius + 1 <= F:
            return "v5"
        return "v5w" if radius == 1 and C <= MAX_CHANNELS else "v2"
    if 2 * radius + 1 <= F:
        return "v4"
    return "v4w" if radius == 1 and C <= MAX_CHANNELS else "v2"


def _dispatch(x, offset, w, radius, interpret):
    v = _kernel_version(radius, x.shape[-1])
    if v == "v1":
        return _forward(x, offset, w, radius, interpret)
    if v == "v5xw":
        return _forward_v5xw(x, offset, w, radius, interpret)
    if v == "v5x":
        return _forward_v5x(x, offset, w, radius, interpret)
    if v == "v5w":
        return _forward_v5w(x, offset, w, radius, interpret)
    if v == "v5":
        return _forward_v5(x, offset, w, radius, interpret)
    if v == "v4w":
        return _forward_v4w(x, offset, w, radius, interpret)
    if v == "v4":
        return _forward_v4(x, offset, w, radius, interpret)
    if v == "v3":
        return _forward_v3(x, offset, w, radius, interpret)
    return _forward_v2(x, offset, w, radius, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def deform_conv3d_pallas(x, offset, w, radius: int = 2,
                         interpret: bool = False):
    """Deformable 3³ conv (stride 1, dil 1, pad 1, groups 1) on TPU.
    Kernel version per DLKA_PALLAS_KERNEL; see _kernel_version. The
    `auto` default resolves to v5x when the window span fits one lane
    pack (R=1, C≤32), v5xw for R=1 with wider C, else v2 — with the
    call's scoped-VMEM limit raised (DLKA_PALLAS_VMEM_LIMIT_MB) so it
    fits the while-nested sliding-window scan program. `auto4` pins
    the previous v4/v4w defaults."""
    return _dispatch(x, offset, w, radius, interpret)


def _fwd(x, offset, w, radius, interpret):
    return _dispatch(x, offset, w, radius, interpret), (x, offset, w)


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
