"""Isolate why the full-res UnetResBlock measures 6-7 ms when its
pieces (conv 0.3, instance-norm ~0, lrelu ~0) sum to <1 ms. A/B the
composed block under each conv impl and with norm ablations.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N1, N2, REPS = 2, 6, 8


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
    print(f"  {name}: {per:.3f} ms", flush=True)
    return per


def main():
    import flax.linen as nn
    from deformablelka_tpu.nn.dynunet import UnetResBlock

    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    rs = np.random.RandomState(0)
    x16 = jnp.asarray(rs.randn(1, 64, 128, 128, 16) * 0.1, dt)

    ur = UnetResBlock(3, 16, kernel_size=3, stride=1,
                      norm_name="instance")
    v = jax.jit(ur.init)(rng, x16)

    for impl in ("auto", "lax", "s2d", "im2col"):
        os.environ["DLKA_CONV_IMPL"] = impl
        slope(f"UnetResBlock full-res C16 conv={impl}",
              lambda v, y: ur.apply(v, y), v, x16)
    os.environ["DLKA_CONV_IMPL"] = "auto"

    # norm ablation: same block shape with batch norm (no spatial
    # reduction) and with no norm at all
    from deformablelka_tpu.nn.layers import Conv3d
    from deformablelka_tpu.nn.norms import InstanceNorm

    class NoNorm(nn.Module):
        @nn.compact
        def __call__(self, y):
            out = Conv3d(16, 3, name="c1")(y)
            out = nn.leaky_relu(out, 0.01)
            out = Conv3d(16, 3, name="c2")(out)
            return nn.leaky_relu(out + y, 0.01)
    m = NoNorm()
    v2 = jax.jit(m.init)(rng, x16)
    slope("block no-norm", lambda v, y: m.apply(v, y), v2, x16)

    class WithIN(nn.Module):
        @nn.compact
        def __call__(self, y):
            out = Conv3d(16, 3, name="c1")(y)
            out = InstanceNorm(affine=False, name="n1")(out)
            out = nn.leaky_relu(out, 0.01)
            out = Conv3d(16, 3, name="c2")(out)
            out = InstanceNorm(affine=False, name="n2")(out)
            return nn.leaky_relu(out + y, 0.01)
    m2 = WithIN()
    v3 = jax.jit(m2.init)(rng, x16)
    slope("block with-IN", lambda v, y: m2.apply(v, y), v3, x16)


if __name__ == "__main__":
    main()
