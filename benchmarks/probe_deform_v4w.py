"""On-device A/B: v4w pallas kernel vs the XLA window path at the
flagship's stage-1 (16^3 C64) and stage-2 (8^3 C128) shapes, plus the
full DeformConvPack3d at those stages (hybrid fast branch now routes
through v4w when it wins).
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


def slope(name, f, x):
    ts = {}
    for n in (N1, N2):
        def chain(x, n=n):
            y = x
            for _ in range(n):
                y = f(y)
            return jnp.sum(y.astype(jnp.float32))
        fj = jax.jit(chain)
        np.asarray(fj(x))
        t0 = time.time()
        for _ in range(REPS):
            out = fj(x)
        np.asarray(out)
        ts[n] = (time.time() - t0) / REPS * 1000
    per = (ts[n2] - ts[n1]) / (n2 - n1) if False else \
        (ts[N2] - ts[N1]) / (N2 - N1)
    print(f"  {name}: {per:.2f} ms", flush=True)
    return per


def main():
    from deformablelka_tpu.ops.pallas.deform3d_kernel import (
        _forward_v4w, deform_conv3d_pallas)
    from deformablelka_tpu.ops.deform3d import deform_conv3d_window
    from deformablelka_tpu.nn import blocks3d as B3

    rng = jax.random.PRNGKey(0)
    rs = np.random.RandomState(0)
    dt = jnp.bfloat16
    for sp, C in ((16, 64), (8, 128)):
        print(f"stage {sp}^3 C{C}:", flush=True)
        xf = jnp.asarray(rs.randn(1, sp, sp, sp, C) * 0.1, jnp.float32)
        x = xf.astype(dt)
        off = jnp.asarray(
            np.clip(rs.randn(1, sp, sp, sp, 81) * 0.2, -0.9, 0.9),
            jnp.float32)
        w = jnp.asarray(rs.randn(3, 3, 3, C, C) * 0.05, jnp.float32)

        ref = deform_conv3d_window(xf, off, w, None, stride=1,
                                   padding=1, dilation=1, groups=1,
                                   radius=1)
        try:
            got = jax.jit(lambda x, o, w: _forward_v4w(x, o, w, 1))(
                xf, off, w)
            err = float(jnp.max(jnp.abs(ref - got.astype(jnp.float32))))
            sc = float(jnp.max(jnp.abs(ref)))
            print(f"  v4w parity maxabs {err:.3e} (scale {sc:.2f})",
                  flush=True)
            slope("v4w", lambda y: _forward_v4w(
                y, off, w, 1).astype(dt), x)
        except Exception as e:
            print(f"  v4w FAILED: {str(e)[:200]}", flush=True)
        slope("XLA window R1", lambda y: deform_conv3d_window(
            y, off, w, None, stride=1, padding=1, dilation=1,
            groups=1, radius=1).astype(dt), x)

        d = B3.DeformConvPack3d()
        v = jax.jit(d.init)(rng, x)
        slope("DeformConvPack3d (hybrid)",
              lambda y, d=d, v=v: d.apply(v, y), x)


if __name__ == "__main__":
    main()
