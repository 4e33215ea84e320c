"""Probe v6 candidates at stage-0 (32^3 C32 R1) against shipped v4.

Dissect recap: nohat (const hats, same FMA count + dot) = 1.07 ms,
v4 (factored full-width hats) = 2.3 — the remaining gap is the hat
BUILD (7 full-width arrays via abs/sub/max each). Candidates:

  v4   — anchor (shipped).
  v4r  — hats via the relu identities exact for clipped |d|<=R=1:
         hz[-1]=relu(-d), hz[1]=relu(d), hz[0]=1-hz[-1]-hz[1]
         → 4 wide ops per axis instead of ~9.
  v4b  — v4r with the 9-term zy FMA chain in bf16 (xs and hats cast;
         accumulate f32 at the end of each sz row). Tests whether
         Mosaic emits packed bf16 VPU ops worth the cast traffic.
  v4t  — v4r with TY=16, TX=32 tiles (fewer tiles, bigger blocks;
         MAX_TILE=16 was a v1-era bisect — retest on v4 structure).
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
    _make_tiles, deform_conv3d_pallas)
from deformablelka_tpu.ops.deform3d import deform_conv3d_window

S, C, R = 32, 32, 1
m = R + 1
F = 4
span = 2 * R + 1


def make_kernel(mode, TZ, TY, TX):
    def kern(off_ref, xt_ref, w_ref, out_ref):
        k = pl.program_id(1)
        bz = k // 9 - 1
        by = (k // 3) % 3 - 1
        bx = k % 3 - 1
        wide = (TZ, TY, TX, F * C)
        lane_g = jax.lax.broadcasted_iota(jnp.int32, wide, 3) // C
        dx = jnp.clip(off_ref[2], -R, R)
        s_of_lane = lane_g.astype(jnp.float32) - R
        hxp = jnp.maximum(0.0, 1.0 - jnp.abs(dx[..., None] - s_of_lane))
        hxp = jnp.where(lane_g < span, hxp, 0.0)
        dzf = jnp.broadcast_to(jnp.clip(off_ref[0], -R, R)[..., None],
                               wide)
        dyf = jnp.broadcast_to(jnp.clip(off_ref[1], -R, R)[..., None],
                               wide)
        if mode == "v4":
            hz = [jnp.maximum(0.0, 1.0 - jnp.abs(dzf - s))
                  for s in range(-R, R + 1)]
            hy = [jnp.maximum(0.0, 1.0 - jnp.abs(dyf - s))
                  for s in range(-R, R + 1)]
        else:
            hzm = jnp.maximum(0.0, -dzf)
            hzp = jnp.maximum(0.0, dzf)
            hz = [hzm, 1.0 - hzm - hzp, hzp]
            hym = jnp.maximum(0.0, -dyf)
            hyp = jnp.maximum(0.0, dyf)
            hy = [hym, 1.0 - hym - hyp, hyp]

        def xs(sz, sy):
            return xt_ref[pl.ds(m + bz + sz - R, TZ),
                          pl.ds(m + by + sy - R, TY),
                          pl.ds(m + bx - R, TX), :]

        if mode == "v4b":
            hyb = [h.astype(jnp.bfloat16) for h in hy]
            acc = jnp.zeros(wide, jnp.float32)
            for sz in range(span):
                t = jnp.zeros(wide, jnp.bfloat16)
                for sy in range(span):
                    t = t + hyb[sy] * xs(sz, sy).astype(jnp.bfloat16)
                acc = acc + hz[sz] * t.astype(jnp.float32)
        else:
            acc = jnp.zeros(wide, jnp.float32)
            for sz in range(span):
                t = jnp.zeros(wide, jnp.float32)
                for sy in range(span):
                    t = t + hy[sy] * xs(sz, sy)
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

    return kern


def forward(x, offset, w, mode):
    B, D, H, W, Cc = x.shape
    TZ, TY, TX = (8, 16, 32) if mode == "v4t" else (8, 16, 16)
    n_z, n_y, n_x = D // TZ, H // TY, W // TX
    n_t = n_z * n_y * n_x
    xp = jnp.pad(x, ((0, 0), (m, m), (m, m), (m, m + F - 1), (0, 0))
                 ).astype(jnp.float32)
    xp4 = jnp.concatenate(
        [jax.lax.slice_in_dim(xp, g, g + W + 2 * m, axis=3)
         for g in range(F)], axis=-1)
    off_all = jnp.transpose(
        offset.reshape(B, D, H, W, 27, 3),
        (0, 4, 5, 1, 2, 3)).astype(jnp.float32)
    w_k3 = w.reshape(27, C, C).astype(jnp.float32)
    kern = make_kernel(mode, TZ, TY, TX)

    off, xp4b = off_all[0], xp4[0]
    o = off.reshape(27, 3, n_z, TZ, n_y, TY, n_x, TX)
    o = jnp.transpose(o, (0, 2, 4, 6, 1, 3, 5, 7))
    o = o.reshape(27 * n_t * 3, TZ, TY, TX)
    tiles = _make_tiles(xp4b, D, H, W, TZ, TY, TX, m)
    out = pl.pallas_call(
        kern,
        grid=(n_t, 27),
        in_specs=[
            pl.BlockSpec((3, TZ, TY, TX),
                         lambda t, k: (k * n_t + t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TZ + 2 * m, TY + 2 * m, TX + 2 * m, F * C),
                         lambda t, k: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, C), lambda t, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TZ, TY, TX, C),
                               lambda t, k: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_t * TZ, TY, TX, C),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 10 ** 9, bytes_accessed=xp4b.size * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(o, tiles, w_k3)
    s = out.reshape(n_z, n_y, n_x, TZ, TY, TX, C)
    s = jnp.transpose(s, (0, 3, 1, 4, 2, 5, 6))
    return s.reshape(D, H, W, C).astype(x.dtype)[None]


def slope(name, f, args):
    ts = {}
    for n in (2, 6):
        def chain(args, n=n):
            x, off, w = args
            y = x
            for _ in range(n):
                y = f(y, off, w)
            return jnp.sum(y.astype(jnp.float32))
        fj = jax.jit(chain)
        np.asarray(fj(args))
        t0 = time.time()
        for _ in range(5):
            out = fj(args)
        np.asarray(out)
        ts[n] = (time.time() - t0) / 5 * 1000
    per = (ts[6] - ts[2]) / 4
    print(f"  {name}: {per:.2f} ms", flush=True)
    return per


def main():
    rs = np.random.RandomState(0)
    xf = jnp.asarray(rs.randn(1, S, S, S, C), jnp.float32)
    off = jnp.asarray(
        np.clip(rs.randn(1, S, S, S, 81) * 0.4, -0.95, 0.95), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 3, C, C) * 0.1, jnp.float32)
    ref = deform_conv3d_window(xf, off, w, None, stride=1, padding=1,
                               dilation=1, groups=1, radius=R)
    scale = float(jnp.max(jnp.abs(ref)))
    x = xf.astype(jnp.bfloat16)
    for mode in ("v4", "v4r", "v4b", "v4t"):
        try:
            got = jax.jit(lambda x, o, w, mode=mode:
                          forward(x, o, w, mode))(xf, off, w)
            err = float(jnp.max(jnp.abs(ref - got.astype(jnp.float32))))
            print(f"{mode}: parity maxabs {err:.3e} (scale {scale:.2f})",
                  flush=True)
            slope(mode, lambda y, o, w, mode=mode:
                  forward(y, o, w, mode), (x, off, w))
        except Exception as e:
            print(f"{mode} FAILED: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
