"""Pinpoint the slow pair in the full-res C16 block composition:
s2d/un-s2d transposes alone, conv+lrelu, conv+bias, conv+conv, and the
whole-block-in-s2d-space candidate.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N1, N2, REPS = 2, 6, 8


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
    print(f"  {name}: {per:.3f} ms", flush=True)
    return per


def s2d(x):
    B, D, H, W, C = x.shape
    X = x.reshape(B, D // 2, 2, H // 2, 2, W // 2, 2, C)
    return X.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        B, D // 2, H // 2, W // 2, 8 * C)


def und2s(X, C):
    B, Dc, Hc, Wc, _ = X.shape
    y = X.reshape(B, Dc, Hc, Wc, 2, 2, 2, C)
    return y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
        B, Dc * 2, Hc * 2, Wc * 2, C)


if __name__ == "__main__":
    rs = np.random.RandomState(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rs.randn(1, 64, 128, 128, 16) * 0.1, dt)
    w = jnp.asarray(rs.randn(3, 3, 3, 16, 16) * 0.05, dt)
    b = jnp.asarray(rs.randn(16) * 0.05, jnp.float32)

    def conv(y, w):
        return lax.conv_general_dilated(
            y, w, (1, 1, 1), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    slope("s2d+un-s2d only", lambda y: und2s(s2d(y), 16).astype(dt), x)
    slope("conv alone", lambda w, y: conv(y, w).astype(dt), w, x)
    slope("conv+lrelu", lambda w, y: jax.nn.leaky_relu(
        conv(y, w), 0.01).astype(dt), w, x)
    slope("conv+bias+lrelu", lambda w, y: jax.nn.leaky_relu(
        conv(y, w) + b.astype(dt), 0.01).astype(dt), w, x)
    slope("conv+conv", lambda w, y: conv(conv(y, w), w).astype(dt), w, x)
    slope("conv+lrelu+conv+res", lambda w, y: (conv(jax.nn.leaky_relu(
        conv(y, w), 0.01), w) + y).astype(dt), w, x)

    # whole block in s2d space
    from deformablelka_tpu.ops.convs import _conv3d_s2d

    def block_s2d(w, y):
        # build the scattered weight once per trace (free at runtime —
        # constant-folded only if w were const; here it's an arg, so
        # count its cost honestly)
        out = _conv3d_s2d(y, w, None)
        out = jax.nn.leaky_relu(out, 0.01)
        out = _conv3d_s2d(out, w, None)
        return (out + y).astype(dt)
    slope("block via per-conv s2d", block_s2d, w, x)
