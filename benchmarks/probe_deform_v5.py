"""Probe deform-kernel v5 candidates at stage-0 (32^3 C32 R1).

The dissect probe showed the v3 kernel's cost is the 9 per-window-term
lane BROADCASTS of the C-free hat products (w2[..., None] * xs):
nohat=1.07 ms, fma1=1.71, full=5.22. Candidates that cut broadcasts:

  v3   — anchor (9 broadcasts/tap).
  v5a  — factored hats: broadcast dz,dy once (2B), build hz/hy
         full-width, 9 muls + 12 FMAs.
  v5b  — u/v difference form, nested zy evaluation, EXACT for |d|<=1:
         per axis  Sum_s hat(d-s) x_s = x0 + relu(d)(x+ - x0)
         + relu(-d)(x- - x0); y-stage shared across sz -> 4 broadcasts
         (uy, vy, uz, vz), 16 full FMA-class ops.
  v5c  — v5b with broadcasts via MXU outer product (w2 @ ones(1,128)).

All parity-checked vs deform_conv3d_window (same clip semantics).
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
    _make_tiles, _tile_of, deform_conv3d_pallas)
from deformablelka_tpu.ops.deform3d import deform_conv3d_window

S, C, R = 32, 32, 1
m = R + 1
F = 4
TZ, TY, TX = 8, 16, 16
span = 2 * R + 1


def make_kernel(mode):
    def kern(off_ref, xt_ref, w_ref, out_ref):
        k = pl.program_id(1)
        bz = k // 9 - 1
        by = (k // 3) % 3 - 1
        bx = k % 3 - 1
        lane_g = jax.lax.broadcasted_iota(
            jnp.int32, (TZ, TY, TX, F * C), 3) // C
        dx = jnp.clip(off_ref[2], -R, R)
        s_of_lane = lane_g.astype(jnp.float32) - R
        hxp = jnp.maximum(0.0, 1.0 - jnp.abs(dx[..., None] - s_of_lane))
        hxp = jnp.where(lane_g < span, hxp, 0.0)
        dz = jnp.clip(off_ref[0], -R, R)
        dy = jnp.clip(off_ref[1], -R, R)

        def bcast(a):
            if mode == "v5c":
                return jax.lax.dot_general(
                    a.reshape(TZ * TY * TX, 1),
                    jnp.ones((1, F * C), jnp.float32),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(TZ, TY, TX, F * C)
            return jnp.broadcast_to(a[..., None], (TZ, TY, TX, F * C))

        def xs(sz, sy):
            return xt_ref[pl.ds(m + bz + sz, TZ),
                          pl.ds(m + by + sy, TY),
                          pl.ds(m + bx - R, TX), :]

        if mode == "v3":
            hz = [jnp.maximum(0.0, 1.0 - jnp.abs(dz - s))
                  for s in range(-R, R + 1)]
            hy = [jnp.maximum(0.0, 1.0 - jnp.abs(dy - s))
                  for s in range(-R, R + 1)]
            acc = jnp.zeros((TZ, TY, TX, F * C), jnp.float32)
            for sz in range(span):
                for sy in range(span):
                    w2 = hz[sz] * hy[sy]
                    acc = acc + w2[..., None] * xs(sz - R, sy - R)
            sample = hxp * acc
        elif mode == "v5a":
            dzf = bcast(dz)
            dyf = bcast(dy)
            hzf = [jnp.maximum(0.0, 1.0 - jnp.abs(dzf - s))
                   for s in range(-R, R + 1)]
            hyf = [jnp.maximum(0.0, 1.0 - jnp.abs(dyf - s))
                   for s in range(-R, R + 1)]
            acc = jnp.zeros((TZ, TY, TX, F * C), jnp.float32)
            for sz in range(span):
                t = jnp.zeros((TZ, TY, TX, F * C), jnp.float32)
                for sy in range(span):
                    t = t + hyf[sy] * xs(sz - R, sy - R)
                acc = acc + hzf[sz] * t
            sample = hxp * acc
        else:  # v5b / v5c: u/v nested difference form
            uy = bcast(jnp.maximum(dy, 0.0))
            vy = bcast(jnp.maximum(-dy, 0.0))
            uz = bcast(jnp.maximum(dz, 0.0))
            vz = bcast(jnp.maximum(-dz, 0.0))
            ts = []
            for sz in (-1, 0, 1):
                x0 = xs(sz, 0)
                xp_ = xs(sz, 1)
                xm = xs(sz, -1)
                ts.append(x0 + uy * (xp_ - x0) + vy * (xm - x0))
            acc = ts[1] + uz * (ts[2] - ts[1]) + vz * (ts[0] - ts[1])
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
    kern = make_kernel(mode)

    def one_batch(args):
        off, xp4b = args
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
        return s.reshape(D, H, W, C).astype(x.dtype)

    return one_batch((off_all[0], xp4[0]))[None]


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
    rs = np.random.RandomState(0)
    xf = jnp.asarray(rs.randn(1, S, S, S, C), jnp.float32)
    off = jnp.asarray(rs.randn(1, S, S, S, 81) * 0.6, jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 3, C, C) * 0.1, jnp.float32)
    ref = deform_conv3d_window(xf, off, w, None, stride=1, padding=1,
                               dilation=1, groups=1, radius=R)
    scale = float(jnp.max(jnp.abs(ref)))

    x = xf.astype(jnp.bfloat16)
    for mode in ("v3", "v5a", "v5b", "v5c"):
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
    slope("shipped v3", lambda y, o, w: deform_conv3d_pallas(y, o, w, R),
          (x, off, w))


if __name__ == "__main__":
    main()
