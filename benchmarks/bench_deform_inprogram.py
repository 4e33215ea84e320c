"""In-program (chained-slope) A/B of the deform-conv implementations at
the REAL flagship stage shapes (patch (2,4,4) on 64x128x128 -> 32^3 C32,
16^3 C64, 8^3 C128). Offsets come from a zero-init offset conv exactly
as in the model, so 'hybrid' takes its fast branch as it does on real
checkpoints."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N1, N2 = 2, 6
REPS = 5


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
    print(f"{name}: {per:.2f} ms in-program", flush=True)


def main():
    from deformablelka_tpu import ops
    from deformablelka_tpu.nn import blocks3d as B3

    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    for sp, dim in [((32, 32, 32), 32), ((16, 16, 16), 64)]:
        x = jnp.asarray(rng.randn(1, *sp, dim) * 0.1, dt)
        # realistic sub-voxel offsets (trained absmax 0.034, PERF.md)
        off = jnp.asarray(rng.randn(1, *sp, 81) * 0.02, dt)
        w = jnp.asarray(rng.randn(3, 3, 3, dim, dim) * 0.05, dt)

        for impl in ("hybrid", "window", "pallas", "gather"):
            def f(off, y, impl=impl):
                with ops.deform_impl(impl):
                    return ops.deform_conv3d(y, off, w, None, stride=1,
                                             padding=1)
            try:
                slope(f"{sp[0]}^3 C{dim} impl={impl}", f, off, x)
            except Exception as e:
                print(f"{sp[0]}^3 C{dim} impl={impl}: FAILED "
                      f"{type(e).__name__}", flush=True)

        # full DeformConvPack (offset conv included) under the default
        d = B3.DeformConvPack3d()
        vd = jax.jit(d.init)(jax.random.PRNGKey(0), x)
        slope(f"{sp[0]}^3 C{dim} DeformConvPack3d (default)",
              lambda v, y: d.apply(v, y), vd, x)


if __name__ == "__main__":
    main()
