"""Dissect DeformConvPack3d at stage-0 (32^3 C32): offset conv,
hybrid guard + raw deform op, and the full pack — in-program slope.
Identifies the gap between the raw pallas kernel (~2.3 ms) and the
pack's measured time.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N1, N2, REPS = 2, 6, 5


def slope(name, f, v, x):
    ts = {}
    for n in (N1, N2):
        def chain(v, x, n=n):
            y = x
            for _ in range(n):
                y = f(v, y)
            return jnp.sum(y.astype(jnp.float32))
        fj = jax.jit(chain)
        np.asarray(fj(v, x))
        t0 = time.time()
        for _ in range(REPS):
            out = fj(v, x)
        np.asarray(out)
        ts[n] = (time.time() - t0) / REPS * 1000
    per = (ts[N2] - ts[N1]) / (N2 - N1)
    print(f"  {name}: {per:.2f} ms", flush=True)
    return per


def main():
    import flax.linen as nn
    from deformablelka_tpu.nn import blocks3d as B3
    from deformablelka_tpu import ops
    from deformablelka_tpu.ops.pallas.deform3d_kernel import (
        deform_conv3d_pallas)

    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    rs = np.random.RandomState(0)
    sp, dim = 32, 32
    x = jnp.asarray(rs.randn(1, sp, sp, sp, dim) * 0.1, dt)

    d = B3.DeformConvPack3d()
    v = jax.jit(d.init)(rng, x)
    slope("full DeformConvPack3d", lambda v, y: d.apply(v, y), v, x)

    # offset conv alone: 3^3 conv C32 -> 81
    class OffConv(nn.Module):
        @nn.compact
        def __call__(self, y):
            o = nn.Conv(81, (3, 3, 3), padding=1, dtype=y.dtype)(y)
            return jnp.pad(o, ((0, 0),) * 4 + ((0, dim - 81 % dim),))[
                ..., :dim] if False else o[..., :dim]
    oc = OffConv()
    vo = jax.jit(oc.init)(rng, x)
    slope("offset conv (3^3 C32->81, proj back)",
          lambda v, y: oc.apply(v, y), vo, x)

    # raw pallas op with fixed weights (channel-preserving so chains)
    # sub-voxel offsets (|d| < 1) so the hybrid guard takes the FAST
    # branch — randn*0.3 would exceed R=1 and force the gather
    # (the PERF.md "74 ms" trap).
    off = jnp.asarray(
        np.clip(rs.randn(1, sp, sp, sp, 81) * 0.2, -0.9, 0.9),
        jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 3, dim, dim) * 0.05, jnp.float32)
    slope("raw pallas v4 (fixed offsets)",
          lambda v, y: deform_conv3d_pallas(y, off, w, 1).astype(dt),
          None, x)

    # ops.deform_conv3d hybrid (guard + cond) with fixed offsets
    slope("ops.deform_conv3d hybrid (fixed offsets)",
          lambda v, y: ops.deform_conv3d(
              y, off, w, stride=1, padding=1, dilation=1).astype(dt),
          None, x)


if __name__ == "__main__":
    main()
