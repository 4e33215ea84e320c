"""Dissect the flagship's ~20 ms rest-of-model (non-transformer-block
cost) this session: stem, full-res encoder1, each decoder upsample,
final head — at the real shapes of the (64,128,128) Synapse patch.
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
    print(f"  {name}: {per:.3f} ms", flush=True)
    return per


def main():
    import flax.linen as nn
    from deformablelka_tpu.nn.dynunet import UnetResBlock, UnetOutBlock
    from deformablelka_tpu.nn.layers import Conv3d, ConvTranspose
    from deformablelka_tpu.nn.norms import GroupNorm

    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    rs = np.random.RandomState(0)
    full = jnp.asarray(rs.randn(1, 64, 128, 128, 1) * 0.1, dt)
    full16 = jnp.asarray(rs.randn(1, 64, 128, 128, 16) * 0.1, dt)

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, y):
            y = Conv3d(32, (2, 4, 4), stride=(2, 4, 4), padding=0,
                       name="stem_conv")(y)
            return GroupNorm(num_groups=1, name="stem_norm")(y)
    m = Stem()
    v = jax.jit(m.init)(rng, full)

    def f_stem(v, y):
        out = m.apply(v, y)
        return jnp.broadcast_to(
            jnp.mean(out.astype(jnp.float32)).astype(dt), y.shape)
    slope("stem (2,4,4) conv+gn", f_stem, v, full)

    ur = UnetResBlock(3, 16, kernel_size=3, stride=1,
                      norm_name="instance")
    v = jax.jit(ur.init)(rng, full)

    def f_enc1(v, y):
        out = ur.apply(v, y)
        return jnp.broadcast_to(
            jnp.mean(out.astype(jnp.float32), axis=-1, keepdims=True)
            .astype(dt), y.shape)
    slope("encoder1 UnetResBlock full-res C1->16", f_enc1, v, full)

    ur16 = UnetResBlock(3, 16, kernel_size=3, stride=1,
                        norm_name="instance")
    v = jax.jit(ur16.init)(rng, full16)
    slope("UnetResBlock full-res C16->16",
          lambda v, y: ur16.apply(v, y), v, full16)

    # decoder2: transpose (2,4,4) from (32,32,32,32) -> full-res 16
    x32 = jnp.asarray(rs.randn(1, 32, 32, 32, 32) * 0.1, dt)
    ct = ConvTranspose(16, (2, 4, 4), stride=(2, 4, 4))
    v = jax.jit(ct.init)(rng, x32)

    def f_ct(v, y):
        out = ct.apply(v, y)
        s = jnp.mean(out.astype(jnp.float32)).astype(dt)
        return y + s
    slope("decoder2 transpose (2,4,4) 32C->16C full-res", f_ct, v, x32)

    # intermediate decoder transposes
    for sp, cin, cout in ((4, 256, 128), (8, 128, 64), (16, 64, 32)):
        xi = jnp.asarray(rs.randn(1, sp, sp, sp, cin) * 0.1, dt)
        cti = ConvTranspose(cout, 2, stride=2)
        v = jax.jit(cti.init)(rng, xi)

        def f_cti(v, y, cti=cti):
            out = cti.apply(v, y)
            s = jnp.mean(out.astype(jnp.float32)).astype(dt)
            return y + s
        slope(f"decoder transpose 2x {sp}^3 C{cin}->C{cout}", f_cti, v,
              xi)

    ob = UnetOutBlock(3, 14)
    v = jax.jit(ob.init)(rng, full16)

    def f_head(v, y):
        out = ob.apply(v, y)
        return jnp.broadcast_to(
            jnp.mean(out.astype(jnp.float32), axis=-1, keepdims=True)
            .astype(dt), y.shape)
    slope("out1 head 1x1 C16->14 full-res", f_head, v, full16)


if __name__ == "__main__":
    main()
