"""Sub-op timings INSIDE the stage-1 flagship block (32ch @ 32x64x64):
which of the ~52 ms does each piece own?"""
import os, sys, time

sys.path.insert(0, "/root/repo")

import numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench(name, fn, *args, reps=5):
    f = jax.jit(lambda *a: jax.tree.reduce(
        lambda acc, t: acc + jnp.sum(t.astype(jnp.float32)), fn(*a), 0.0))
    np.asarray(f(*args))
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    np.asarray(out)
    print(f"{name}: {(time.time()-t0)/reps*1000:.1f} ms", flush=True)


def main():
    import deformablelka_tpu.nn.blocks3d as B3
    from deformablelka_tpu.nn.layers import Conv3d
    from deformablelka_tpu.nn.dynunet import UnetResBlock

    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    sp, dim = (32, 64, 64), 32
    x = jnp.asarray(np.random.RandomState(0).randn(1, *sp, dim), dt)

    import flax.linen as nn

    class DWPair(nn.Module):
        @nn.compact
        def __call__(self, x):
            return B3._dw_pair3d(x, dim)

    m = DWPair()
    v = jax.jit(m.init)(rng, x)
    bench("dw5+dw7d3 pair", lambda v, x: m.apply(v, x), v, x)

    # offset predictor conv (3^3, 32 -> 81)
    class Off(nn.Module):
        @nn.compact
        def __call__(self, x):
            return Conv3d(81, 3, padding=1, name="c")(x)
    m = Off(); v = jax.jit(m.init)(rng, x)
    bench("conv_offset 3^3 32->81", lambda v, x: m.apply(v, x), v, x)

    # the deform conv itself (gather + GEMM) with realistic small offsets
    from deformablelka_tpu.ops import deform_conv3d
    w = jnp.asarray(np.random.RandomState(1).randn(3, 3, 3, dim, dim) * .05, dt)
    offs = jnp.asarray(np.random.RandomState(2).randn(1, *sp, 81) * .3, dt)
    bench("deform_conv3d (hybrid default)",
          lambda o: deform_conv3d(x, o, w, None, stride=1, padding=1), offs)
    os.environ["DLKA_DEFORM_IMPL"] = "gather"
    bench("deform_conv3d (gather)",
          lambda o: deform_conv3d(x, o, w, None, stride=1, padding=1), offs)
    os.environ.pop("DLKA_DEFORM_IMPL")

    # 1x1 convs (proj_1 / proj_2 / conv1 / conv8)
    class One(nn.Module):
        @nn.compact
        def __call__(self, x):
            return Conv3d(dim, 1, name="c")(x)
    m = One(); v = jax.jit(m.init)(rng, x)
    bench("1x1x1 conv 32->32", lambda v, x: m.apply(v, x), v, x)

    # UnetResBlock tail (conv51)
    blk = UnetResBlock(3, dim, kernel_size=3, stride=1, norm_name="batch")
    v = jax.jit(blk.init)(rng, x)
    bench("UnetResBlock tail 32ch", lambda v, x: blk.apply(v, x, mutable=[]),
          v, x)

    # full gate for reference
    g = B3.LKA3dDeform()
    v = jax.jit(g.init)(rng, x)
    bench("LKA3dDeform gate (full)", lambda v, x: g.apply(v, x), v, x)


if __name__ == "__main__":
    main()
