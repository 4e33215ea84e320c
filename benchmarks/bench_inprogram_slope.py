"""IN-PROGRAM per-op costs at the stage-0 flagship shape (32x64x64,
C=32) via chained-slope timing: time y=f(y) chains of length N1 and N2
inside ONE jit program and report (t(N2)-t(N1))/(N2-N1). This removes
dispatch overhead and keeps XLA's cross-op fusion in play — PERF.md
documents repeatedly that isolated-op timings do not predict whole-graph
cost on this backend."""
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


def slope(name, make_apply, v, x):
    ts = {}
    for n in (N1, N2):
        def chain(v, x, n=n):
            y = x
            for _ in range(n):
                y = make_apply(v, y)
            return jnp.sum(y.astype(jnp.float32))
        f = jax.jit(chain)
        np.asarray(f(v, x))  # compile+warm
        t0 = time.time()
        for _ in range(REPS):
            out = f(v, x)
        np.asarray(out)
        ts[n] = (time.time() - t0) / REPS * 1000
    per = (ts[N2] - ts[N1]) / (N2 - N1)
    print(f"{name}: {per:.2f} ms in-program  (chain{N1}={ts[N1]:.1f}, "
          f"chain{N2}={ts[N2]:.1f})", flush=True)
    return per


def main():
    import flax.linen as nn

    import deformablelka_tpu.nn.blocks3d as B3
    from deformablelka_tpu.nn.layers import Conv3d
    from deformablelka_tpu.nn.dynunet import UnetResBlock
    from deformablelka_tpu.nn.transformer3d import TRANSFORMER_BLOCKS

    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    sp, dim = (32, 64, 64), 32
    x = jnp.asarray(np.random.RandomState(0).randn(1, *sp, dim) * 0.1, dt)

    # full transformer block (the flagship's stage-0 unit)
    Block = TRANSFORMER_BLOCKS["TransformerBlock_3D_single_deform_LKA"]
    b = Block(hidden_size=dim, proj_size=64, num_heads=4,
              input_size=int(np.prod(sp)))
    v = jax.jit(b.init)(rng, x)
    slope("full block", lambda v, y: b.apply(v, y, mutable=[])[0], v, x)

    # gate only (dw5+dw7d3 -> deform -> 1x1, multiply)
    g = B3.LKA3dDeform()
    vg = jax.jit(g.init)(rng, x)
    slope("LKA3dDeform gate", lambda v, y: g.apply(v, y), vg, x)

    # dw pair only
    class DWPair(nn.Module):
        @nn.compact
        def __call__(self, y):
            return B3._dw_pair3d(y, dim)
    m = DWPair(); vm = jax.jit(m.init)(rng, x)
    slope("dw5+dw7d3 pair", lambda v, y: m.apply(v, y), vm, x)

    # DeformConvPack (zero-init offset conv -> offsets ~0 -> fast branch)
    d = B3.DeformConvPack3d()
    vd = jax.jit(d.init)(rng, x)
    slope("DeformConvPack3d (real offsets)",
          lambda v, y: d.apply(v, y), vd, x)

    # UnetResBlock tail
    blk = UnetResBlock(3, dim, kernel_size=3, stride=1, norm_name="batch")
    vb = jax.jit(blk.init)(rng, x)
    slope("UnetResBlock tail",
          lambda v, y: blk.apply(v, y, mutable=[])[0], vb, x)

    # 1x1 conv
    class One(nn.Module):
        @nn.compact
        def __call__(self, y):
            return Conv3d(dim, 1, name="c")(y)
    o = One(); vo = jax.jit(o.init)(rng, x)
    slope("1x1x1 conv 32->32", lambda v, y: o.apply(v, y), vo, x)


if __name__ == "__main__":
    main()
