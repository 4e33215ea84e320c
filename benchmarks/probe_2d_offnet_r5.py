"""Round-5: isolate the 2D DeformConv machinery per component, stacked
6x in one jit program (chained-slope) at decoder_0/1 shapes. The
flagship-vs-baseline swap shows deform costs 3.78 ms in-context while
the bare window ops sum to ~1 ms — where is the rest? Candidates: the
dense DILATED 7x7 offset conv (emitter quality), the hybrid cond
boundary, gelu/proj fusion breaks."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N1, N2, REPS = 2, 8, 10


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
    import flax.linen as nn
    from deformablelka_tpu.nn.lka2d import DeformConv
    from deformablelka_tpu.nn.layers import Conv2d

    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    rs = np.random.RandomState(0)
    for (hw, C) in ((56, 96), (28, 192)):
        x = jnp.asarray(rs.randn(1, hw, hw, C) * 0.1, dt)

        def probe_mod(name, mod, x=x):
            v = jax.jit(mod.init)(rng, x)

            def f(y, mod=mod, v=v):
                out = mod.apply(v, y)
                if out.shape != y.shape:
                    return (y + jnp.mean(out.astype(jnp.float32))
                            .astype(y.dtype))
                return out.astype(y.dtype)
            return slope(f"{hw}x{hw}xC{C} {name}", f)

        def slope2(name, f, x=x):
            return slope(f"{hw}x{hw}xC{C} {name}", f, x)

        # full DeformConv modules (offset net + hybrid deform op)
        for (k, pad, dil) in ((5, 2, 1), (7, 9, 3)):
            mod = DeformConv(kernel_size=(k, k), padding=pad,
                             dilation=dil, groups=C)
            v = jax.jit(mod.init)(rng, x)
            slope2(f"DeformConv {k}x{k}d{dil} (full)",
                   lambda y, mod=mod, v=v: mod.apply(v, y).astype(dt))
            # offset net alone (dense conv -> 2K channels)
            off = Conv2d(2 * k * k, (k, k), padding=pad, dilation=dil,
                         use_bias=True)
            vo = jax.jit(off.init)(rng, x)
            slope2(f"offset_net {k}x{k}d{dil} dense",
                   lambda y, off=off, vo=vo:
                   (y + jnp.mean(off.apply(vo, y)
                                 .astype(jnp.float32)).astype(dt)))


if __name__ == "__main__":
    main()
