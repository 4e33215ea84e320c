"""Round-5 A/B: unrolled vs lax.scan tap loop in the 2D window deform
op, at the decoder_0 shapes (56²×96, K=25 and K=49-dil3). In-program
slope (chain of N ops inside one jit) so scan launch overhead is
visible. probe_dec0_r4 measured the scan path at 0.566/1.438 ms."""
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
    # deform_conv2d_window DIRECTLY (radius=1, the hybrid fast branch).
    # First version of this probe called the ops.deform_conv2d hybrid
    # wrapper with |off| > 1 offsets — both configs took the GATHER
    # branch and the knob was never exercised (0.74/1.4 ms both ways,
    # the gather numbers).
    from deformablelka_tpu.ops.deform2d import deform_conv2d_window

    rs = np.random.RandomState(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rs.randn(1, 56, 56, 96) * 0.1, dt)
    for (k, dil, pad) in ((5, 1, 2), (7, 3, 9)):
        K = k * k
        off = jnp.asarray(rs.randn(1, 56, 56, 2 * K) * 0.3, jnp.float32)
        w = jnp.asarray(rs.randn(k, k, 1, 96) * 0.05, jnp.float32)
        for unroll in ("0", "1"):
            os.environ["DLKA_DEFORM2D_UNROLL"] = unroll

            def f(y, off=off, w=w, pad=pad, dil=dil):
                return deform_conv2d_window(
                    y, off, w, None, stride=1, padding=pad,
                    dilation=dil, groups=96, radius=1).astype(dt)
            slope(f"{k}x{k}d{dil} window unroll={unroll}", f, x)


if __name__ == "__main__":
    main()
