"""Round-4 stage-0 hat-build attack (VERDICT r3 task #7).

v4's dissection: kernel = 1.07 ms with constant window weights vs
2.3-2.7 real at stage-0 — the hat EVALUATION owns the rest. v4 already
minimised hat math (2 broadcasts + relu identities). Hypothesis: the
cost is not the ALU ops but the RELAYOUT hidden in
`broadcast_to(d[..., None], wide)` — d is (TZ,TY,TX) with TX in LANES,
so the broadcast moves TX to sublanes (a transpose-class Mosaic op)
before splatting to F*C lanes.

Variants probed (same-session in-program slopes at stage-0 32³ C32 R1,
B=1, vs the v4 baseline and the raw-kernel floor):

  v5s  — offsets arrive as (3, TZ, TY, TX, 1) blocks: TX already in
         sublanes, the lane dim is 1, so the in-kernel broadcast is a
         pure lane-splat. Hat math unchanged (relu identities).
  v5h  — XLA precomputes the 6 narrow hat planes (hz/hy for s∈{-1,0,1})
         + clipped dx, streams them as a (7, TZ, TY, TX, 1) block; the
         kernel only splats + FMAs (VERDICT's "precompute hats in XLA
         and stream" form).
  const — v4 kernel with hats replaced by constants (the floor).

Usage: python benchmarks/probe_deform_v5s.py
"""

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from deformablelka_tpu.ops.pallas.deform3d_kernel import (
    MAX_TILE, MAX_TILE_Z, _tile_of, _make_tiles, _relu_hats,
    _forward_v4, deform_conv3d_pallas)


def _kernel_v5s(off_ref, xt_ref, w_ref, out_ref, *, TZ, TY, TX, C, R, m,
                F, n_hat):
    """n_hat=3: off planes (dz,dy,dx) — hats built in-kernel from
    lane-splatted d. n_hat=7: pre-built (hz-,hz0,hz+,hy-,hy0,hy+,dx)."""
    span = 2 * R + 1
    k = pl.program_id(1)
    bz = k // 9 - 1
    by = (k // 3) % 3 - 1
    bx = k % 3 - 1
    wide = (TZ, TY, TX, F * C)

    def splat(i):
        # off_ref: (TZ, TY, TX, n_hat) — planes LANE-packed; static lane
        # slice + lane broadcast (both Mosaic-legal; the sublane-folded
        # and trailing-1 5-D layouts HTTP-500, bisected 2026-08-19)
        return jnp.broadcast_to(off_ref[:, :, :, i:i + 1], wide)

    lane_g = jax.lax.broadcasted_iota(jnp.int32, wide, 3) // C
    if n_hat == 3:
        hz = _relu_hats(jnp.clip(splat(0), -R, R), R)
        hy = _relu_hats(jnp.clip(splat(1), -R, R), R)
        dxw = jnp.clip(splat(2), -R, R)
    else:
        hz = [splat(0), splat(1), splat(2)]
        hy = [splat(3), splat(4), splat(5)]
        dxw = splat(6)
    s_of_lane = lane_g.astype(jnp.float32) - R
    hxp = jnp.maximum(0.0, 1.0 - jnp.abs(dxw - s_of_lane))
    hxp = jnp.where(lane_g < span, hxp, 0.0)

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


def _forward_v5(x, offset, w, radius, variant):
    """variant: 'v5s' (splat, 3 planes) or 'v5h' (7 pre-built planes)."""
    B, D, H, W, C = x.shape
    R = radius
    m = R + 1
    F = next(f for f in (4, 2, 1) if f * C <= 128)
    span = 2 * R + 1
    assert span <= F
    TZ = _tile_of(D, MAX_TILE_Z) if D > MAX_TILE else _tile_of(D)
    TY, TX = _tile_of(H), _tile_of(W)
    n_z, n_y, n_x = D // TZ, H // TY, W // TX
    n_t = n_z * n_y * n_x
    nbt = B * n_t

    xp = jnp.pad(x, ((0, 0), (m, m), (m, m), (m, m + F - 1), (0, 0))
                 ).astype(jnp.float32)
    xp4 = jnp.concatenate(
        [jax.lax.slice_in_dim(xp, g, g + W + 2 * m, axis=3)
         for g in range(F)], axis=-1)
    off_all = jnp.transpose(
        offset.reshape(B, D, H, W, 27, 3),
        (0, 4, 5, 1, 2, 3)).astype(jnp.float32)  # (B,27,3,D,H,W)
    if variant == "v5h":
        d = jnp.clip(off_all, -R, R)
        hz = [jnp.maximum(0.0, -d[:, :, 0]),
              1.0 - jnp.abs(jnp.clip(d[:, :, 0], -1, 1)),
              jnp.maximum(0.0, d[:, :, 0])]
        # NB: middle hat = 1-relu(-d)-relu(d) = 1-|d| for |d|<=1
        hz[1] = 1.0 - hz[0] - hz[2]
        hy0 = jnp.maximum(0.0, -d[:, :, 1])
        hy2 = jnp.maximum(0.0, d[:, :, 1])
        planes = jnp.stack(
            [hz[0], hz[1], hz[2], hy0, 1.0 - hy0 - hy2, hy2, d[:, :, 2]],
            axis=2)  # (B,27,7,D,H,W)
        n_hat = 7
    else:
        planes = off_all
        n_hat = 3

    w_k3 = w.reshape(27, C, C).astype(jnp.float32)
    kern = functools.partial(_kernel_v5s, TZ=TZ, TY=TY, TX=TX, C=C, R=R,
                             m=m, F=F, n_hat=n_hat)
    o = planes.reshape(B, 27, n_hat, n_z, TZ, n_y, TY, n_x, TX)
    o = jnp.transpose(o, (1, 0, 3, 5, 7, 4, 6, 8, 2))  # planes last
    o = o.reshape(27 * nbt * TZ, TY, TX, n_hat)
    tiles = jax.vmap(
        lambda v: _make_tiles(v, D, H, W, TZ, TY, TX, m))(xp4)
    tiles = tiles.reshape(nbt * (TZ + 2 * m), TY + 2 * m,
                          TX + 2 * m, F * C)
    out = pl.pallas_call(
        kern,
        grid=(nbt, 27),
        in_specs=[
            pl.BlockSpec((TZ, TY, TX, n_hat),
                         lambda t, k, nbt=nbt: (k * nbt + t, 0, 0, 0),
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
        out_shape=jax.ShapeDtypeStruct((nbt * TZ, TY, TX, C),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=B * D * H * W * C * 27 * 2 * (F * 11 + C),
            bytes_accessed=tiles.size * 4 + o.size * 4,
            transcendentals=0),
    )(o, tiles, w_k3)
    s = out.reshape(B, n_z, n_y, n_x, TZ, TY, TX, C)
    s = jnp.transpose(s, (0, 1, 4, 2, 5, 3, 6, 7))
    return s.reshape(B, D, H, W, C).astype(x.dtype)


N1, N2, REPS = 2, 8, 5


def slope(name, f, *args):
    ts = {}
    for n in (N1, N2):
        def chain(*a, n=n):
            y = a[-1]
            for _ in range(n):
                y = f(*a[:-1], y)
            return jnp.sum(y.astype(jnp.float32))
        fj = jax.jit(chain)
        np.asarray(fj(*args))
        t0 = time.time()
        for _ in range(REPS):
            out = fj(*args)
        np.asarray(out)
        ts[n] = (time.time() - t0) / REPS * 1000
    per = (ts[N2] - ts[N1]) / (N2 - N1)
    print(f"  {name}: {per:.3f} ms", file=sys.stderr, flush=True)
    return per


def main():
    rs = np.random.RandomState(0)
    dt = jnp.bfloat16
    sp, C = 32, 32
    x = jnp.asarray(rs.randn(1, sp, sp, sp, C) * 0.1, dt)
    off = jnp.asarray(rs.randn(1, sp, sp, sp, 81) * 0.3, dt)
    w = jnp.asarray(rs.randn(3, 3, 3, C, C) * 0.05, jnp.float32)

    report = {}
    # parity first (cheap shapes would hide layout bugs; use the real one)
    ref = np.asarray(_forward_v4(x.astype(jnp.float32),
                                 off.astype(jnp.float32), w, 1),
                     np.float32)
    for name, f in (("v5s", lambda xx, oo: _forward_v5(xx, oo, w, 1, "v5s")),
                    ("v5h", lambda xx, oo: _forward_v5(xx, oo, w, 1, "v5h"))):
        try:
            got = np.asarray(jax.jit(f)(x.astype(jnp.float32),
                                        off.astype(jnp.float32)),
                             np.float32)
            err = float(np.max(np.abs(got - ref)) /
                        (np.max(np.abs(ref)) + 1e-9))
            report[f"{name}_maxrel_vs_v4"] = round(err, 7)
            print(f"  parity {name}: maxrel {err:.2e}", file=sys.stderr,
                  flush=True)
        except Exception as e:
            report[f"{name}_maxrel_vs_v4"] = f"{type(e).__name__}: {str(e)[:160]}"
            print(f"  parity {name}: {report[f'{name}_maxrel_vs_v4']}",
                  file=sys.stderr, flush=True)

    report["v4_ms"] = slope(
        "v4 (baseline)",
        lambda oo, y: _forward_v4(y, oo, w, 1).astype(dt), off, x)
    for name in ("v5s", "v5h"):
        if not isinstance(report[f"{name}_maxrel_vs_v4"], float):
            continue
        report[f"{name}_ms"] = slope(
            name,
            lambda oo, y, n=name: _forward_v5(y, oo, w, 1, n).astype(dt),
            off, x)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
