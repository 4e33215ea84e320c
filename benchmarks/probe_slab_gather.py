"""Probe: per-tap slab gather (ONE lax.gather of (2,2,2,C) slices) vs the
8-corner take_along_axis in ops/deform3d._trilinear_gather.

Same bytes, 27 gathers instead of 216. Validity masking is preserved via
a 1-voxel zero pad ring + CLIP mode (corners of in-band samples land on
the pad ring; far-out samples are masked explicitly)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def slab_trilinear(xpad, D, H, W, zs, ys, xs, dt):
    """xpad: (B, D+2, H+2, W+2, C) zero-padded; zs/ys/xs: (B, P)."""
    C = xpad.shape[-1]
    z0 = jnp.floor(zs)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    dz = (zs - z0).astype(dt)[..., None]
    dy = (ys - y0).astype(dt)[..., None]
    dx = (xs - x0).astype(dt)[..., None]
    z0i = z0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    idx = jnp.stack([jnp.clip(z0i, -1, D - 1) + 1,
                     jnp.clip(y0i, -1, H - 1) + 1,
                     jnp.clip(x0i, -1, W - 1) + 1], axis=-1)
    dn = lax.GatherDimensionNumbers(offset_dims=(1, 2, 3, 4),
                                    collapsed_slice_dims=(),
                                    start_index_map=(0, 1, 2))
    g = jax.vmap(lambda xp, ix: lax.gather(
        xp, ix, dn, slice_sizes=(2, 2, 2, C),
        mode=lax.GatherScatterMode.CLIP))(xpad, idx)  # (B,P,2,2,2,C)
    out = None
    for oz in (0, 1):
        wz = dz if oz else (1.0 - dz)
        vz = (z0i + oz >= 0) & (z0i + oz < D)
        for oy in (0, 1):
            wy = dy if oy else (1.0 - dy)
            vy = (y0i + oy >= 0) & (y0i + oy < H)
            for ox in (0, 1):
                wx = dx if ox else (1.0 - dx)
                vx = (x0i + ox >= 0) & (x0i + ox < W)
                w = (wz * wy * wx) * (vz & vy & vx)[..., None].astype(dt)
                contrib = g[:, :, oz, oy, ox, :] * w
                out = contrib if out is None else out + contrib
    return out


def deform_conv3d_slab(x, offset, w):
    """3x3x3, stride 1, pad 1, dil 1, groups 1 — slab-gather variant."""
    B, D, H, W, C = x.shape
    K = 27
    P = D * H * W
    dt = x.dtype
    base_z = jnp.broadcast_to(jnp.arange(D, dtype=jnp.float32)[:, None, None],
                              (D, H, W)).reshape(1, P)
    base_y = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[None, :, None],
                              (D, H, W)).reshape(1, P)
    base_x = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, None, :],
                              (D, H, W)).reshape(1, P)
    off = jnp.moveaxis(offset.reshape(B, P, K, 3).astype(jnp.float32), 2, 0)
    taps = jnp.asarray([[i - 1, j - 1, m - 1] for i in range(3)
                        for j in range(3) for m in range(3)], jnp.float32)
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    w_k = w.reshape(K, C, C)

    def body(acc, xs_in):
        off_t, tap, wt = xs_in
        zs = base_z + tap[0] + off_t[..., 0]
        ys = base_y + tap[1] + off_t[..., 1]
        xs_ = base_x + tap[2] + off_t[..., 2]
        samp = slab_trilinear(xpad, D, H, W, zs, ys, xs_, dt)
        contrib = jnp.einsum("bpc,co->bpo", samp, wt.astype(dt))
        return acc + contrib, None

    out, _ = jax.lax.scan(body, jnp.zeros((B, P, C), dt),
                          (off, taps, w_k))
    return out.reshape(B, D, H, W, C)


def main():
    from deformablelka_tpu.ops.deform3d import deform_conv3d as dg
    rng = np.random.RandomState(0)
    # parity first (small, wild offsets incl. far out-of-range)
    x = jnp.asarray(rng.randn(1, 6, 7, 5, 4).astype(np.float32))
    off = jnp.asarray((rng.randn(1, 6, 7, 5, 81) * 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 4, 4).astype(np.float32) * 0.2)
    ref = dg(x, off, w, stride=1, padding=1, dilation=1, groups=1)
    got = deform_conv3d_slab(x, off, w)
    err = float(jnp.max(jnp.abs(ref - got)))
    print("parity max err:", err, flush=True)
    assert err < 2e-4, err

    def bench(name, f, *args, reps=5):
        g = jax.jit(lambda *a: jnp.sum(f(*a).astype(jnp.float32)))
        np.asarray(g(*args))
        t0 = time.time()
        for _ in range(reps):
            out = g(*args)
        np.asarray(out)
        print(f"{name}: {(time.time() - t0) / reps * 1000:.1f} ms",
              flush=True)

    sp, C = (32, 64, 64), 32
    x = jnp.asarray(rng.randn(1, *sp, C).astype(np.float32)).astype(
        jnp.bfloat16)
    off = jnp.asarray((rng.rand(1, *sp, 81).astype(np.float32) - 0.5)
                      ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 3, C, C).astype(np.float32) * 0.1
                    ).astype(jnp.bfloat16)
    bench("gather (8xTAA)  C32 @32x64x64",
          lambda x, o, w: dg(x, o, w, stride=1, padding=1, dilation=1,
                             groups=1), x, off, w)
    bench("slab  (1xgather) C32 @32x64x64", deform_conv3d_slab, x, off, w)


if __name__ == "__main__":
    main()
