"""Round-5: bare-op A/B of the pallas 2D depthwise deform kernel vs
the XLA window path at ALL FOUR decoder stage shapes (the model-level
pallas loss was only ever root-caused at C=384; probe each stage).
In-program slopes, bf16 in/out like the model."""
import os
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
                y = (f(y) + y).astype(x.dtype)
            return jnp.sum(y.astype(jnp.float32))
        fj = jax.jit(chain)
        np.asarray(fj(x))
        t0 = time.time()
        for _ in range(REPS):
            out = fj(x)
        np.asarray(out)
        ts[n] = (time.time() - t0) / REPS * 1000
    per = (ts[N2] - ts[N1]) / (N2 - N1)
    print(f"  {name}: {per:.3f} ms", flush=True)
    return per


def main():
    from deformablelka_tpu.ops.deform2d import deform_conv2d_window
    from deformablelka_tpu.ops.pallas.deform2d_kernel import (
        deform_dw_conv2d_pallas)

    rs = np.random.RandomState(0)
    dt = jnp.bfloat16
    for (hw, C) in ((56, 96), (28, 192), (14, 384), (7, 768)):
        x = jnp.asarray(rs.randn(1, hw, hw, C) * 0.1, dt)
        for (k, dil) in ((5, 1), (7, 3)):
            K = k * k
            pad = (k // 2) * dil
            off = jnp.asarray(rs.randn(1, hw, hw, 2 * K) * 0.3,
                              jnp.float32)
            w = jnp.asarray(rs.randn(k, k, 1, C) * 0.05, jnp.float32)

            def fw(y, off=off, w=w, pad=pad, dil=dil, C=C):
                return deform_conv2d_window(
                    y, off, w, None, stride=1, padding=pad,
                    dilation=dil, groups=C, radius=1).astype(dt)

            def fp(y, off=off, w=w, dil=dil):
                return deform_dw_conv2d_pallas(
                    y, off, w, radius=1, dil=dil).astype(dt)

            slope(f"{hw}x{hw}xC{C} {k}x{k}d{dil} window", fw, x)
            try:
                slope(f"{hw}x{hw}xC{C} {k}x{k}d{dil} pallas", fp, x)
            except Exception as e:
                print(f"  {hw}x{hw}xC{C} {k}x{k}d{dil} pallas FAIL: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
