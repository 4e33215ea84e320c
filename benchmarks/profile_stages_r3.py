"""Round-3 session profile: in-program slope of every flagship component
at the REAL stage shapes (patch 64x128x128, embed (2,4,4) -> stages
32^3 C32 x6 blocks, 16^3 C64 x6, 8^3 C128 x6, 4^3 C256 x3), plus the
full-model forward. Tells us where the ~92 ms/fwd lives THIS session.
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
    print(f"  {name}: {per:.2f} ms", flush=True)
    return per


def main():
    import flax.linen as nn
    from deformablelka_tpu.nn import blocks3d as B3
    from deformablelka_tpu.nn.transformer3d import TRANSFORMER_BLOCKS
    from deformablelka_tpu.nn.dynunet import UnetResBlock

    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    rs = np.random.RandomState(0)
    counts = {32: 6, 16: 6, 8: 6, 4: 3}
    total_blocks = 0.0
    for sp, dim in [(32, 32), (16, 64), (8, 128), (4, 256)]:
        print(f"stage {sp}^3 C{dim} (x{counts[sp]} blocks):", flush=True)
        x = jnp.asarray(rs.randn(1, sp, sp, sp, dim) * 0.1, dt)
        N = sp ** 3

        blk = TRANSFORMER_BLOCKS["TransformerBlock_3D_single_deform_LKA"](
            input_size=N, hidden_size=dim, proj_size=64)
        v = jax.jit(blk.init)(rng, x)
        t_blk = slope("full deform block", lambda v, y: blk.apply(v, y), v, x)
        total_blocks += t_blk * counts[sp]

        class DWPair(nn.Module):
            @nn.compact
            def __call__(self, y):
                return B3._dw_pair3d(y, dim)
        m = DWPair()
        v = jax.jit(m.init)(rng, x)
        slope("dw5+dw7d3 pair", lambda v, y: m.apply(v, y), v, x)

        d = B3.DeformConvPack3d()
        v = jax.jit(d.init)(rng, x)
        slope("DeformConvPack3d", lambda v, y: d.apply(v, y), v, x)

        ur = UnetResBlock(3, dim, kernel_size=3, stride=1, norm_name="batch")
        v = jax.jit(ur.init)(rng, x)
        slope("UnetResBlock tail", lambda v, y: ur.apply(v, y), v, x)

    print(f"sum over blocks: {total_blocks:.1f} ms", flush=True)

    from deformablelka_tpu.models.dlka_former import dlka_former_synapse
    from deformablelka_tpu.utils.profiling import latency_bench_scan
    model = dlka_former_synapse(num_classes=14, do_ds=False)
    x = jnp.zeros((1, 64, 128, 128, 1), dt)
    v = jax.jit(model.init)(rng, x)
    r = latency_bench_scan(lambda v, x: model.apply(v, x), (v, x),
                           reps=20, rounds=2)
    print(f"full model fwd: {r['mean_ms']:.1f} ms device", flush=True)


if __name__ == "__main__":
    main()
