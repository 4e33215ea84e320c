"""Session A/B of the dilated depthwise-conv implementations at the
flagship's two hot stage shapes. The 2026-08-19 session runs the MXU
at ~195 TFLOP/s (the tunnel throttle is gone), so every emitter-vs-
rewrite choice calibrated on throttled sessions needs re-measuring:
the stage dissect shows dw7³d3 at 1.11 ms (32³ C32) / 1.39 ms
(16³ C64) ≈ 15 ms of the 72 ms flagship forward.
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


def slope(name, f, *args):
    ts = {}
    for n in (N1, N2):
        def chain(*a, n=n):
            y = a[-1]
            for _ in range(n):
                y = f(*a[:-1], y)
            return jnp.sum(y.astype(jnp.float32))
        fj = jax.jit(chain)
        try:
            np.asarray(fj(*args))
        except Exception as e:
            print(f"  {name}: FAILED {type(e).__name__}", flush=True)
            return None
        t0 = time.time()
        for _ in range(REPS):
            out = fj(*args)
        np.asarray(out)
        ts[n] = (time.time() - t0) / REPS * 1000
    per = (ts[N2] - ts[N1]) / (N2 - N1)
    print(f"  {name}: {per:.3f} ms", flush=True)
    return per


def main():
    from deformablelka_tpu.ops.convs import (
        _depthwise3d_zdecomp, _depthwise3d_atrous)
    from jax import lax

    rs = np.random.RandomState(0)
    dt = jnp.bfloat16

    for (D, H, W, C) in [(32, 32, 32, 32), (16, 16, 16, 64),
                         (8, 8, 8, 128)]:
        print(f"dw7^3 dil3 {D}x{H}x{W} C{C}:", flush=True)
        x = jnp.asarray(rs.randn(1, D, H, W, C) * 0.1, dt)
        w = jnp.asarray(rs.randn(7, 7, 7, 1, C) * 0.05, jnp.float32)
        p = 9

        def keep(out, y):
            return out.astype(dt)

        slope("lax dil3", lambda w, y: keep(lax.conv_general_dilated(
            y, w.astype(y.dtype), (1, 1, 1), ((p, p),) * 3,
            rhs_dilation=(3, 3, 3), feature_group_count=C,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")), y), w, x)
        slope("zdecomp", lambda w, y: keep(
            _depthwise3d_zdecomp(y, w, 3, None), y), w, x)
        slope("atrous s2b", lambda w, y: keep(
            _depthwise3d_atrous(y, w, 3, None), y), w, x)
        try:
            from deformablelka_tpu.ops.pallas.dwconv3d_kernel import (
                depthwise_conv3d_pallas, dwconv3d_supported)
            if dwconv3d_supported(C, D, H, W, 7, 3):
                slope("pallas stencil", lambda w, y: keep(
                    depthwise_conv3d_pallas(y, w, 7, 3), y), w, x)
            else:
                print("  pallas stencil: unsupported", flush=True)
        except Exception as e:
            print(f"  pallas stencil: {type(e).__name__}", flush=True)

        # dw5^3 dil1 for completeness
        w5 = jnp.asarray(rs.randn(5, 5, 5, 1, C) * 0.05, jnp.float32)
        slope("dw5 lax", lambda w, y: keep(lax.conv_general_dilated(
            y, w.astype(y.dtype), (1, 1, 1), ((2, 2),) * 3,
            feature_group_count=C,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")), y), w5, x)


if __name__ == "__main__":
    main()
