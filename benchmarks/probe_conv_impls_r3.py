"""A/B the dense 3^3 conv implementations (lax emitter vs
space-to-depth vs im2col) at the flagship's full-res shapes THIS
session, plus the instance-norm cost — the rest-of-model dissection
showed encoder1/decoder2 UnetResBlocks own ~13.5 of the 20 ms
non-block cost.
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
        np.asarray(fj(*args))
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
        _conv3d_im2col, _conv3d_s2d)
    from jax import lax

    rs = np.random.RandomState(0)
    dt = jnp.bfloat16

    def lax_conv(x, w):
        return lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1, 1), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    for (D, H, W, Ci, Co) in [(64, 128, 128, 16, 16),
                              (64, 128, 128, 1, 16),
                              (32, 32, 32, 32, 32)]:
        print(f"3^3 conv {D}x{H}x{W} C{Ci}->C{Co}:", flush=True)
        x = jnp.asarray(rs.randn(1, D, H, W, Ci) * 0.1, dt)
        w = jnp.asarray(rs.randn(3, 3, 3, Ci, Co) * 0.05, jnp.float32)

        def keep(out, y):
            s = jnp.mean(out.astype(jnp.float32)).astype(dt)
            return y + s if out.shape != y.shape else out.astype(dt)

        slope("lax emitter", lambda w, y: keep(lax_conv(y, w), y), w, x)
        slope("s2d", lambda w, y: keep(
            _conv3d_s2d(y, w, None), y), w, x)
        slope("im2col", lambda w, y: keep(
            _conv3d_im2col(y, w, ((1, 1),) * 3, None), y), w, x)

    # instance norm at full res (f32 reduction)
    import flax.linen as nn
    from deformablelka_tpu.nn.dynunet import _norm
    x16 = jnp.asarray(rs.randn(1, 64, 128, 128, 16) * 0.1, dt)

    class IN(nn.Module):
        @nn.compact
        def __call__(self, y):
            return _norm("instance", "n", False)(y)
    m = IN()
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x16)
    slope("instance norm full-res C16",
          lambda v, y: m.apply(v, y).astype(dt), v, x16)

    # leaky relu full-res
    slope("lrelu full-res C16",
          lambda y: jax.nn.leaky_relu(y, 0.01), x16)


if __name__ == "__main__":
    main()
