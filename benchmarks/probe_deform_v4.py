"""Probe deform kernel v4: tap-GROUPED in-kernel dot + cheap x-fold.

Two hypotheses at the real stage shapes (R=1 hybrid fast branch):

1. The v3 per-tap dot (P, C)@(C, C) at C=32 uses 32/128 of the MXU's
   K rows and 32/128 of its N columns (~6 % utilisation) and runs 27
   times per tile. Grouping G = 128//C taps per grid step turns it
   into ceil(27/G) dots of (P, G*C)@(G*C, C) — full K at C=32 — and
   cuts the out_ref read-modify-write accumulations 27 -> 7.
2. v3's full-width hxp multiply + F-segment fold (~4 full-width VPU
   ops/tap) can be replaced by 3 C-lane FMAs using the small per-axis
   hx hats directly.

The generalised kernel also covers C=64 (F=2, 2 x-packs, G=2) and
C=128 (F=1, 3 packs, G=1), extending pallas eligibility past the v3
span<=F gate (VERDICT r2 item 1a).

Parity vs ops.deform_conv3d_window (identical clip semantics) and
chained-slope timing vs the shipped v3/v2 at stage shapes.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from deformablelka_tpu.ops.pallas.deform3d_kernel import (
    _make_tiles, _tile_of, MAX_TILE, MAX_TILE_Z)
from deformablelka_tpu.ops.deform3d import deform_conv3d_window


def _kernel_v4(off_ref, xt_ref, w_ref, out_ref, samp_ref, *, TZ, TY,
               TX, C, R, m, F, G, NG):
    """One grid step = one (tile, tap-group): sample G taps into the
    samp scratch's lane segments, then one (P, G*C)@(G*C, C) dot
    accumulated into the resident output block.

    off_ref: (3*G, TZ, TY, TX) — (dz,dy,dx) per tap in the group.
    xt_ref:  (TZ+2m, TY+2m, TX+2m, F*C) packed halo tile (resident
             across all NG group steps — BlockSpec ignores the group).
    w_ref:   (1, G*C, C) — the group's taps stacked along K.
    samp_ref: VMEM scratch (TZ, TY, TX, G*C).
    """
    span = 2 * R + 1
    n_packs = (span + F - 1) // F
    ng = pl.program_id(1)

    for g in range(G):
        tap = ng * G + g
        kk = jnp.where(tap < 27, tap, 0)
        bz = kk // 9 - 1
        by = (kk // 3) % 3 - 1
        bx = kk % 3 - 1
        dz = jnp.clip(off_ref[3 * g], -R, R)
        dy = jnp.clip(off_ref[3 * g + 1], -R, R)
        dx = jnp.clip(off_ref[3 * g + 2], -R, R)
        hz = [jnp.maximum(0.0, 1.0 - jnp.abs(dz - s))
              for s in range(-R, R + 1)]
        hy = [jnp.maximum(0.0, 1.0 - jnp.abs(dy - s))
              for s in range(-R, R + 1)]
        hx = [jnp.maximum(0.0, 1.0 - jnp.abs(dx - s))
              for s in range(-R, R + 1)]

        samp = None
        for p in range(n_packs):
            acc = None
            for sz in range(span):
                for sy in range(span):
                    w2 = hz[sz] * hy[sy]
                    xs = xt_ref[pl.ds(m + bz + sz - R, TZ),
                                pl.ds(m + by + sy - R, TY),
                                pl.ds(m + bx + p * F - R, TX), :]
                    t = w2[..., None] * xs
                    acc = t if acc is None else acc + t
            # fold pack lanes with the small per-shift hx hats
            for lg in range(F):
                s = p * F + lg
                if s >= span:
                    break
                piece = hx[s][..., None] * acc[..., lg * C:(lg + 1) * C]
                samp = piece if samp is None else samp + piece
        samp_ref[..., g * C:(g + 1) * C] = samp

    contrib = jax.lax.dot_general(
        samp_ref[...].reshape(TZ * TY * TX, G * C), w_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(TZ, TY, TX, C)

    @pl.when(ng == 0)
    def _():
        out_ref[...] = contrib

    @pl.when(ng > 0)
    def _():
        out_ref[...] = out_ref[...] + contrib


def forward_v4(x, offset, w, radius, interpret=False):
    B, D, H, W, C = x.shape
    R = radius
    m = R + 1
    F = next(f for f in (4, 2, 1) if f * C <= 128)
    G = max(1, 128 // C)
    NG = -(-27 // G)
    NT = NG * G  # padded tap count
    span = 2 * R + 1
    TZ = _tile_of(D, MAX_TILE_Z) if D > MAX_TILE else _tile_of(D)
    TY, TX = _tile_of(H), _tile_of(W)
    n_z, n_y, n_x = D // TZ, H // TY, W // TX
    n_t = n_z * n_y * n_x

    xp = jnp.pad(x, ((0, 0), (m, m), (m, m), (m, m + F - 1), (0, 0))
                 ).astype(jnp.float32)
    xp4 = jnp.concatenate(
        [jax.lax.slice_in_dim(xp, g, g + W + 2 * m, axis=3)
         for g in range(F)], axis=-1)
    off_all = jnp.transpose(
        offset.reshape(B, D, H, W, 27, 3),
        (0, 4, 5, 1, 2, 3)).astype(jnp.float32)  # (B,27,3,D,H,W)
    off_all = jnp.pad(off_all, ((0, 0), (0, NT - 27), (0, 0), (0, 0),
                                (0, 0), (0, 0)))
    w_pad = jnp.pad(w.reshape(27, C, C), ((0, NT - 27), (0, 0), (0, 0))
                    ).astype(jnp.float32)
    w_g = w_pad.reshape(NG, G * C, C)

    kern = functools.partial(_kernel_v4, TZ=TZ, TY=TY, TX=TX, C=C, R=R,
                             m=m, F=F, G=G, NG=NG)
    n_packs = (span + F - 1) // F
    flops = int(D * H * W * C * 27 * 2 * (F * span * span * n_packs / G
                                          + span + C))

    def one_batch(args):
        off, xp4b = args
        # (NT,3,D,H,W) -> (NG, n_t, G*3, TZ, TY, TX) flat on dim 0
        o = off.reshape(NG, G, 3, n_z, TZ, n_y, TY, n_x, TX)
        o = jnp.transpose(o, (0, 3, 5, 7, 1, 2, 4, 6, 8))
        o = o.reshape(NG * n_t * G * 3, TZ, TY, TX)
        tiles = _make_tiles(xp4b, D, H, W, TZ, TY, TX, m)
        out = pl.pallas_call(
            kern,
            grid=(n_t, NG),
            in_specs=[
                pl.BlockSpec((3 * G, TZ, TY, TX),
                             lambda t, k: (k * n_t + t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TZ + 2 * m, TY + 2 * m, TX + 2 * m,
                              F * C),
                             lambda t, k: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G * C, C), lambda t, k: (k, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TZ, TY, TX, C),
                                   lambda t, k: (t, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_t * TZ, TY, TX, C),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((TZ, TY, TX, G * C),
                                       jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=xp4b.size * 4 + o.size * 4,
                transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(o, tiles, w_g)
        s = out.reshape(n_z, n_y, n_x, TZ, TY, TX, C)
        s = jnp.transpose(s, (0, 3, 1, 4, 2, 5, 6))
        return s.reshape(D, H, W, C).astype(x.dtype)

    if B == 1:
        return one_batch((off_all[0], xp4[0]))[None]
    return jax.lax.map(one_batch, (off_all, xp4))


def slope(name, f, args, n1=2, n2=6, reps=5):
    ts = {}
    for n in (n1, n2):
        def chain(args, n=n):
            x, off, w = args
            y = x
            for _ in range(n):
                y = f(y, off, w)
            return jnp.sum(y.astype(jnp.float32))
        fj = jax.jit(chain)
        np.asarray(fj(args))
        t0 = time.time()
        for _ in range(reps):
            out = fj(args)
        np.asarray(out)
        ts[n] = (time.time() - t0) / reps * 1000
    per = (ts[n2] - ts[n1]) / (n2 - n1)
    print(f"  {name}: {per:.2f} ms", flush=True)
    return per


def main():
    from deformablelka_tpu.ops.pallas.deform3d_kernel import (
        deform_conv3d_pallas)
    R = 1
    for (S, C) in [(32, 32), (16, 64), (8, 128)]:
        print(f"shape {S}^3 C{C}:", flush=True)
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(1, S, S, S, C), jnp.float32)
        off = jnp.asarray(rs.randn(1, S, S, S, 81) * 0.6, jnp.float32)
        w = jnp.asarray(rs.randn(3, 3, 3, C, C) * 0.1, jnp.float32)

        # parity vs the XLA window path (identical clip semantics)
        ref = deform_conv3d_window(x, off, w, None, stride=1, padding=1,
                                   dilation=1, groups=1, radius=R)
        got = jax.jit(lambda x, o, w: forward_v4(x, o, w, R))(x, off, w)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref)))
        print(f"  parity maxabs {err:.3e} (scale {scale:.2f})",
              flush=True)

        xb = x.astype(jnp.bfloat16)
        args = (xb, off, w)

        def run_v4(y, off, w):
            return forward_v4(y, off, w, R)

        def run_ship(y, off, w):
            return deform_conv3d_pallas(y, off, w, R)

        def run_win(y, off, w):
            return deform_conv3d_window(y, off, w, None, stride=1,
                                        padding=1, dilation=1, groups=1,
                                        radius=R)

        try:
            slope("v4", run_v4, args)
        except Exception as e:
            print(f"  v4 FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
        try:
            slope("shipped (v3/v2 auto)", run_ship, args)
        except Exception as e:
            print(f"  shipped FAILED: {str(e)[:120]}", flush=True)
        slope("window XLA", run_win, args)


if __name__ == "__main__":
    main()
