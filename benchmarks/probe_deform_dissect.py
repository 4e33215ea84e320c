"""Dissect the stage-0 (32^3 C32 R1) pallas deform cost: how much of
the ~5.2 ms is XLA prep (pad/pack/_make_tiles/offset transpose),
in-kernel window FMAs, hat builds, or the per-tap dot.

Variants (all same grid/BlockSpecs as shipped v3):
  full      — shipped v3 path (anchor)
  kern_only — pallas_call on PRE-MADE tiles/offsets (prep excluded)
  prep_only — the XLA prep alone (tiles + offset layout, summed)
  nohat     — hats replaced by constants (measures hat-build cost)
  nodot     — dot replaced by lane-fold sum (measures dot cost)
  fma1      — single window term instead of 9 (measures FMA chain)
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
    _make_tiles, _tile_of, MAX_TILE, MAX_TILE_Z,
    deform_conv3d_pallas)

S, C, R = 32, 32, 1
m = R + 1
F = 4
TZ, TY, TX = 8, 16, 16
n_z = n_y = S // TZ if False else None


def make_kernel(mode):
    span = 2 * R + 1

    def kern(off_ref, xt_ref, w_ref, out_ref):
        k = pl.program_id(1)
        bz = k // 9 - 1
        by = (k // 3) % 3 - 1
        bx = k % 3 - 1
        lane_g = jax.lax.broadcasted_iota(
            jnp.int32, (TZ, TY, TX, F * C), 3) // C
        dx = jnp.clip(off_ref[2], -R, R)
        s_of_lane = lane_g.astype(jnp.float32) - R
        if mode == "nohat":
            hxp = jnp.full((TZ, TY, TX, F * C), 0.33, jnp.float32)
            hz = [jnp.full((TZ, TY, TX), 0.5, jnp.float32)] * span
            hy = hz
        else:
            hxp = jnp.maximum(0.0,
                              1.0 - jnp.abs(dx[..., None] - s_of_lane))
            hxp = jnp.where(lane_g < span, hxp, 0.0)
            dz = jnp.clip(off_ref[0], -R, R)
            dy = jnp.clip(off_ref[1], -R, R)
            hz = [jnp.maximum(0.0, 1.0 - jnp.abs(dz - s))
                  for s in range(-R, R + 1)]
            hy = [jnp.maximum(0.0, 1.0 - jnp.abs(dy - s))
                  for s in range(-R, R + 1)]
        acc = jnp.zeros((TZ, TY, TX, F * C), jnp.float32)
        terms = [(0, 0)] if mode == "fma1" else [
            (sz, sy) for sz in range(span) for sy in range(span)]
        for sz, sy in terms:
            w2 = hz[sz] * hy[sy]
            xs = xt_ref[pl.ds(m + bz + sz - R, TZ),
                        pl.ds(m + by + sy - R, TY),
                        pl.ds(m + bx - R, TX), :]
            acc = acc + w2[..., None] * xs
        sample = hxp * acc
        samp = sample[..., 0:C]
        for g in range(1, F):
            samp = samp + sample[..., g * C:(g + 1) * C]
        if mode == "nodot":
            contrib = samp
        else:
            contrib = jax.lax.dot_general(
                samp.reshape(TZ * TY * TX, C), w_ref[0],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32
            ).reshape(TZ, TY, TX, C)

        @pl.when(k == 0)
        def _():
            out_ref[...] = contrib

        @pl.when(k > 0)
        def _():
            out_ref[...] = out_ref[...] + contrib

    return kern


def call_kernel(o, tiles, w_k3, n_t, mode):
    kern = make_kernel(mode)
    return pl.pallas_call(
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
            flops=10 ** 9, bytes_accessed=tiles.size * 4,
            transcendentals=0),
    )(o, tiles, w_k3)


def prep(x, offset):
    D = H = W = S
    n_z, n_y, n_x = D // TZ, H // TY, W // TX
    n_t = n_z * n_y * n_x
    xp = jnp.pad(x[0], ((m, m), (m, m), (m, m + F - 1), (0, 0))
                 ).astype(jnp.float32)
    xp4 = jnp.concatenate(
        [jax.lax.slice_in_dim(xp, g, g + W + 2 * m, axis=2)
         for g in range(F)], axis=-1)
    off = jnp.transpose(
        offset[0].reshape(D, H, W, 27, 3),
        (3, 4, 0, 1, 2)).astype(jnp.float32)
    o = off.reshape(27, 3, n_z, TZ, n_y, TY, n_x, TX)
    o = jnp.transpose(o, (0, 2, 4, 6, 1, 3, 5, 7))
    o = o.reshape(27 * n_t * 3, TZ, TY, TX)
    tiles = _make_tiles(xp4, D, H, W, TZ, TY, TX, m)
    return o, tiles, n_t


def slope(name, fj, args, n1=2, n2=6, reps=5):
    ts = {}
    for n in (n1, n2):
        f = fj(n)
        np.asarray(f(*args))
        t0 = time.time()
        for _ in range(reps):
            out = f(*args)
        np.asarray(out)
        ts[n] = (time.time() - t0) / reps * 1000
    per = (ts[n2] - ts[n1]) / (n2 - n1)
    print(f"  {name}: {per:.2f} ms", flush=True)
    return per


def main():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, S, S, S, C), jnp.bfloat16)
    off0 = jnp.asarray(rs.randn(1, S, S, S, 81) * 0.3, jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 3, C, C) * 0.1, jnp.float32)
    w_k3 = w.reshape(27, C, C)

    # anchor: full shipped v3
    def mk_full(n):
        def chain(x, off, w):
            y = x
            for _ in range(n):
                y = deform_conv3d_pallas(y, off, w, R)
            return jnp.sum(y.astype(jnp.float32))
        return jax.jit(chain)
    slope("full shipped v3", mk_full, (x, off0, w))

    # prep only
    def mk_prep(n):
        def chain(x, off):
            s = 0.0
            y = x
            for _ in range(n):
                o, tiles, _ = prep(y, off)
                s = s + jnp.sum(o) + jnp.sum(tiles)
                y = y + 1e-6 * s.astype(y.dtype)
            return s
        return jax.jit(chain)
    slope("prep only (pad+pack+tiles+off layout)", mk_prep, (x, off0))

    # kernel only on pre-made inputs
    o, tiles, _ = jax.jit(prep)(x, off0)
    n_t = (S // TZ) * (S // TY) * (S // TX)
    for mode in ("full", "nohat", "nodot", "fma1"):
        def mk(n, mode=mode):
            def chain(o, tiles, w_k3):
                s = None
                t = tiles
                for _ in range(n):
                    out = call_kernel(o, t, w_k3, n_t, mode)
                    s = out if s is None else s + out
                    t = t + 1e-6 * jnp.sum(s)
                return jnp.sum(s)
            return jax.jit(chain)
        try:
            slope(f"kern[{mode}]", mk, (o, tiles, w_k3))
        except Exception as e:
            print(f"  kern[{mode}] FAILED: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
