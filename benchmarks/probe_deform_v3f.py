"""Probe refinements on top of v3b (grid (n_t,27) + in-kernel dot):

v3c: zy window as a 9-term STATIC unroll with per-axis hats
     precomputed once per tap (the earlier 16-term unroll failure was
     for the v1 all-axes window; 9 terms may compile).
v3d: v3b with MAX_TILE_Z=16 (re-probe the z-16 multi-step miscompile
     on the current kernel structure).
v3e: v3b with the dot in bf16 (samp cast before the MXU op).
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
    _make_tiles, _tile_of, MAX_TILE)
from deformablelka_tpu.ops.deform3d import deform_conv3d_window


def _kernel_v3c(off_ref, xt_ref, w_ref, out_ref, *, TZ, TY, TX, C, R,
                m, F, unroll, bf16_dot):
    span = 2 * R + 1
    k = pl.program_id(1)
    bz = k // 9 - 1
    by = (k // 3) % 3 - 1
    bx = k % 3 - 1

    lane_g = jax.lax.broadcasted_iota(jnp.int32, (TZ, TY, TX, F * C),
                                      3) // C
    dx = jnp.clip(off_ref[2].astype(jnp.float32), -R, R)
    s_of_lane = lane_g.astype(jnp.float32) - R
    hxp = jnp.maximum(0.0, 1.0 - jnp.abs(dx[..., None] - s_of_lane))
    hxp = jnp.where(lane_g < span, hxp, 0.0)
    dz = jnp.clip(off_ref[0].astype(jnp.float32), -R, R)
    dy = jnp.clip(off_ref[1].astype(jnp.float32), -R, R)

    if unroll:
        hz = [jnp.maximum(0.0, 1.0 - jnp.abs(dz - s)) for s in (-1, 0, 1)]
        hy = [jnp.maximum(0.0, 1.0 - jnp.abs(dy - s)) for s in (-1, 0, 1)]
        acc = jnp.zeros((TZ, TY, TX, F * C), jnp.float32)
        for sz in range(span):
            for sy in range(span):
                w2 = hz[sz] * hy[sy]
                xs = xt_ref[pl.ds(m + bz + sz - R, TZ),
                            pl.ds(m + by + sy - R, TY),
                            pl.ds(m + bx - R, TX), :].astype(jnp.float32)
                acc = acc + w2[..., None] * xs
    else:
        def zy_body(widx, a):
            sz = widx // span
            sy = widx % span
            w2 = (jnp.maximum(0.0, 1.0 - jnp.abs(dz - (sz - R)))
                  * jnp.maximum(0.0, 1.0 - jnp.abs(dy - (sy - R))))
            xs = xt_ref[pl.ds(m + bz + sz - R, TZ),
                        pl.ds(m + by + sy - R, TY),
                        pl.ds(m + bx - R, TX), :].astype(jnp.float32)
            return a + w2[..., None] * xs
        acc = jax.lax.fori_loop(
            0, span * span, zy_body,
            jnp.zeros((TZ, TY, TX, F * C), jnp.float32))

    sample = hxp * acc
    samp = sample[..., 0:C]
    for g in range(1, F):
        samp = samp + sample[..., g * C:(g + 1) * C]
    if bf16_dot:
        contrib = jax.lax.dot_general(
            samp.reshape(TZ * TY * TX, C).astype(jnp.bfloat16),
            w_ref[0].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(TZ, TY, TX, C)
    else:
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


def forward(x, offset, w, radius, *, tz_cap, unroll, bf16_dot,
            bf16_tiles=False, bf16_off=False, interpret=False):
    B, D, H, W, C = x.shape
    R = radius
    m = R + 1
    F = next(f for f in (4, 2, 1) if f * C <= 128)
    assert 2 * R + 1 <= F, "single-pack probe requires span <= F"
    TZ = _tile_of(D, tz_cap) if D > MAX_TILE else _tile_of(D)
    TY, TX = _tile_of(H), _tile_of(W)
    n_z, n_y, n_x = D // TZ, H // TY, W // TX
    n_t = n_z * n_y * n_x

    tile_dt = jnp.bfloat16 if bf16_tiles else jnp.float32
    xp = jnp.pad(x, ((0, 0), (m, m), (m, m), (m, m + F - 1), (0, 0))
                 ).astype(tile_dt)
    xp4 = jnp.concatenate(
        [jax.lax.slice_in_dim(xp, g, g + W + 2 * m, axis=3)
         for g in range(F)], axis=-1)
    off_all = jnp.transpose(
        offset.reshape(B, D, H, W, 27, 3),
        (0, 4, 5, 1, 2, 3)).astype(jnp.bfloat16 if bf16_off
                                   else jnp.float32)
    w_k3 = w.reshape(27, C, C).astype(jnp.float32)
    span = 2 * R + 1
    flops = D * H * W * F * C * 27 * 2 * (span * span + 2)

    def one_batch(args):
        off, xp4b = args
        o = off.reshape(27, 3, n_z, TZ, n_y, TY, n_x, TX)
        o = jnp.transpose(o, (0, 2, 4, 6, 1, 3, 5, 7))
        o = o.reshape(27 * n_t * 3, TZ, TY, TX)
        tiles = _make_tiles(xp4b, D, H, W, TZ, TY, TX, m)
        kern = functools.partial(_kernel_v3c, TZ=TZ, TY=TY, TX=TX,
                                 C=C, R=R, m=m, F=F, unroll=unroll,
                                 bf16_dot=bf16_dot)
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
                flops=flops + D * H * W * 27 * C * C * 2,
                bytes_accessed=xp4b.size * 4 + o.size * 4,
                transcendentals=0),
            interpret=interpret,
        )(o, tiles, w_k3)
        s = out.reshape(n_z, n_y, n_x, TZ, TY, TX, C)
        s = jnp.transpose(s, (0, 3, 1, 4, 2, 5, 6))
        return s.reshape(D, H, W, C).astype(x.dtype)

    if B == 1:
        return one_batch((off_all[0], xp4[0]))[None]
    return jax.lax.map(one_batch, (off_all, xp4))


def slope(name, f, *args, reps=5):
    ts = {}
    for n in (2, 6):
        def chain(*a, n=n):
            y = a[-1]
            for _ in range(n):
                y = f(*a[:-1], y)
            return jnp.sum(y.astype(jnp.float32))
        fj = jax.jit(chain)
        np.asarray(fj(*args))
        t0 = time.time()
        for _ in range(reps):
            out = fj(*args)
        np.asarray(out)
        ts[n] = (time.time() - t0) / reps * 1000
    print(f"{name}: {(ts[6]-ts[2])/4:.2f} ms in-program", flush=True)


def main():
    rng = np.random.RandomState(0)
    R = 1
    sp, dim = (32, 32, 32), 32
    x = jnp.asarray(rng.randn(1, *sp, dim) * 0.1, jnp.bfloat16)
    off = jnp.asarray(rng.randn(1, *sp, 81) * 0.4, jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 3, dim, dim) * 0.05, jnp.bfloat16)
    ref = deform_conv3d_window(x, off, w, None, stride=1, padding=1,
                               radius=R)
    refm = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))

    cases = [
        ("v3c bf16tiles", dict(tz_cap=8, unroll=True, bf16_dot=False,
                               bf16_tiles=True)),
        ("v3c bf16tiles+off", dict(tz_cap=8, unroll=True, bf16_dot=False,
                                   bf16_tiles=True, bf16_off=True)),
    ]
    for tag, kw in cases:
        try:
            y = forward(x, off, w, R, **kw)
            err = float(jnp.max(jnp.abs(
                y.astype(jnp.float32) - ref.astype(jnp.float32))))
            print(f"{tag}: compiles, relerr {err/max(refm,1e-6):.2e}",
                  flush=True)
            slope(tag, lambda o, y_, kw=kw: forward(y_, o, w, R, **kw),
                  off, x)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
