"""Pallas TPU kernel: 3D depthwise convolution (any odd kernel/dilation).

Why: XLA's 3D *dilated* depthwise emitter is the hottest un-attacked op
of the LKA gate chain (7³ dil-3 at the flagship stage-1 shape: 85 ms in
the first measured session, 12 ms in the second — PERF.md "Dilated
depthwise conv"), used by every 3D LKA variant
(/root/reference/2D/deformable_LKA/LKA3d.py:4-22,
 /root/reference/3D/.../synapse/transformerblock.py:349-392:
 dw5³ → dw7³ dilation-3 → 1×1, multiplicative gate).

Design, respecting the remote-Mosaic constraints catalogued in
deform3d_kernel.py (tiles ≤ (8,16,16), f32 blocks, lanes ≤ 128, no
manual DMA, fori with dynamically-computed *sublane* slices only):

  * A VMEM-budgeted DENSE kernel: grid = (channel blocks, batch·tiles);
    each step runs a fori over the K³ taps accumulating
    `w[tap] · x_tile[static-shape shifted slice]` — pure VPU FMAs on a
    halo'd VMEM tile (halo m = K//2, so even K=7 fits the ~16 MB scoped
    VMEM that a dilated halo m = 9 explodes: lane padding to 128 makes a
    (26,34,34,C≤128) tile cost 15.4 MB ×2 buffers).
  * Dilation via the à trous identity (exactness argument in
    ops/convs._depthwise3d_atrous): space-to-batch(d) phases are
    independent under a dilated tap pattern, so the DENSE kernel runs
    over B·d³ phase volumes folded into the grid's tile axis — no
    per-phase dispatch, one pallas_call total.

The 1×1 + gate of the LKA chain stay in XLA where they fuse into the
channel-mixing GEMM's epilogue (an in-kernel GEMM fed by a fori carry
is a known remote-Mosaic compile failure, deform3d_kernel.py #4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_LANES = 128


def _dw_kernel(w_ref, xt_ref, out_ref, *, TZ, TY, TX, C, K):
    """One grid step = one (channel block, batch·tile).

    w_ref:   (K³, C) VMEM f32 — per-tap weights for this C block.
    xt_ref:  (TZ+2m, TY+2m, TX+2m, C) VMEM f32 halo'd tile (m = K//2).
    out_ref: (TZ, TY, TX, C).
    """

    def tap_body(k, acc):
        sz = k // (K * K)
        sy = (k // K) % K
        sx = k % K
        xs = xt_ref[pl.ds(sz, TZ), pl.ds(sy, TY), pl.ds(sx, TX), :]
        return acc + w_ref[k] * xs

    out_ref[...] = jax.lax.fori_loop(
        0, K ** 3, tap_body, jnp.zeros((TZ, TY, TX, C), jnp.float32))


def _pick_tile(n: int, cap: int) -> tuple[int, int]:
    """(tile, padded n) minimising padding with tile ≤ cap, tile ≥ 2."""
    best = None
    for t in range(min(cap, n), 1, -1):
        padded = -(-n // t) * t
        if best is None or padded < best[1]:
            best = (t, padded)
        if padded == n:
            break
    return best or (n, n)


def _make_tiles(xp, TZ, TY, TX, m):
    """xp: (Bp, D+2m, H+2m, W+2m, C) → overlapping halo'd tiles stacked
    on dim 0: (Bp·n_t·(TZ+2m), TY+2m, TX+2m, C)."""
    Bp, Dp, Hp, Wp, C = xp.shape
    D, H, W = Dp - 2 * m, Hp - 2 * m, Wp - 2 * m
    tiles = []
    for b in range(Bp):
        for z in range(D // TZ):
            for y in range(H // TY):
                for xx in range(W // TX):
                    tiles.append(jax.lax.slice(
                        xp,
                        (b, z * TZ, y * TY, xx * TX, 0),
                        (b + 1, z * TZ + TZ + 2 * m,
                         y * TY + TY + 2 * m, xx * TX + TX + 2 * m, C)))
    return jnp.concatenate([t[0] for t in tiles], axis=0)


def dwconv3d_supported(C, D, H, W, K, dil) -> bool:
    return (jax.default_backend() in ("tpu", "axon")
            and K % 2 == 1 and min(D, H, W) // max(dil, 1) >= 2)


def _dense(x, w_kc, K: int, interpret: bool):
    """Dense depthwise K³ 'same' conv. x: (Bp, D, H, W, C) f32;
    w_kc: (K³, C) f32."""
    Bp, D, H, W, C = x.shape
    m = K // 2
    CB = min(C, MAX_LANES)
    n_c = C // CB
    TZ, Dp = _pick_tile(D, 8)
    TY, Hp = _pick_tile(H, 16)
    TX, Wp = _pick_tile(W, 16)
    n_t = (Dp // TZ) * (Hp // TY) * (Wp // TX)

    if n_c > 1:
        w_kc = jnp.concatenate(
            [w_kc[:, c * CB:(c + 1) * CB] for c in range(n_c)], axis=0)
    xp = jnp.pad(x, ((0, 0), (m, m + Dp - D), (m, m + Hp - H),
                     (m, m + Wp - W), (0, 0)))
    tiles = _make_tiles(xp, TZ, TY, TX, m)
    if n_c > 1:
        tiles = jnp.concatenate(
            [tiles[..., c * CB:(c + 1) * CB] for c in range(n_c)], axis=0)

    kern = functools.partial(_dw_kernel, TZ=TZ, TY=TY, TX=TX, C=CB, K=K)
    out = pl.pallas_call(
        kern,
        grid=(n_c, Bp * n_t),
        in_specs=[
            pl.BlockSpec((K ** 3, CB), lambda c, t: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TZ + 2 * m, TY + 2 * m, TX + 2 * m, CB),
                         lambda c, t: (c * (Bp * n_t) + t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TZ, TY, TX, CB),
                               lambda c, t: (c * (Bp * n_t) + t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_c * Bp * n_t * TZ, TY, TX, CB),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Dp * Hp * Wp * C * K ** 3,
            bytes_accessed=2 * x.size * 4, transcendentals=0),
        interpret=interpret,
    )(w_kc, tiles)
    # (n_c, Bp, nz, ny, nx, TZ, TY, TX, CB) → (Bp, D, H, W, C)
    s = out.reshape(n_c, Bp, Dp // TZ, Hp // TY, Wp // TX, TZ, TY, TX, CB)
    s = jnp.transpose(s, (1, 2, 5, 3, 6, 4, 7, 0, 8))
    s = s.reshape(Bp, Dp, Hp, Wp, C)
    return s[:, :D, :H, :W]


def _dw_forward(x, w, K: int, dil: int, interpret: bool = False):
    """x: (B, D, H, W, C); w: (K, K, K, 1, C), taps row-major
    (kd, kh, kw). 'same' zero padding, stride 1, dilation `dil`."""
    B, D, H, W, C = x.shape
    w_kc = w.reshape(K ** 3, C).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    if dil == 1:
        return _dense(xf, w_kc, K, interpret).astype(x.dtype)
    d = dil
    pads = [(-s) % d for s in (D, H, W)]
    xp = jnp.pad(xf, ((0, 0), (0, pads[0]), (0, pads[1]), (0, pads[2]),
                      (0, 0)))
    Dp, Hp, Wp = D + pads[0], H + pads[1], W + pads[2]
    x6 = xp.reshape(B, Dp // d, d, Hp // d, d, Wp // d, d, C)
    x6 = jnp.transpose(x6, (0, 2, 4, 6, 1, 3, 5, 7))
    xb = x6.reshape(B * d ** 3, Dp // d, Hp // d, Wp // d, C)
    y = _dense(xb, w_kc, K, interpret)
    y = y.reshape(B, d, d, d, Dp // d, Hp // d, Wp // d, C)
    y = jnp.transpose(y, (0, 4, 1, 5, 2, 6, 3, 7))
    y = y.reshape(B, Dp, Hp, Wp, C)[:, :D, :H, :W]
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def depthwise_conv3d_pallas(x, w, K: int, dil: int = 1,
                            interpret: bool = False):
    """Depthwise K³ conv, stride 1, 'same' padding, dilation `dil`.
    x: (B, D, H, W, C); w: (K, K, K, 1, C)."""
    return _dw_forward(x, w, K, dil, interpret)


def _dw_fwd(x, w, K, dil, interpret):
    return _dw_forward(x, w, K, dil, interpret), (x, w)


def _dw_bwd(K, dil, interpret, res, g):
    """Backward delegated to the XLA conv autodiff (dx is the
    tap-flipped depthwise conv, dw a per-tap reduction); the backward
    runs under remat'd training where XLA's emitter cost is amortised."""
    from deformablelka_tpu.ops.convs import depthwise_conv3d
    x, w = res

    def f(x, w):
        return depthwise_conv3d(x, w, padding=(K // 2) * dil,
                                dilation=dil)

    _, vjp = jax.vjp(f, x, w)
    return vjp(g.astype(x.dtype))


depthwise_conv3d_pallas.defvjp(_dw_fwd, _dw_bwd)
