"""Profile the flagship's NON-transformer-block cost: measure the full
model with the deform blocks vs the same skeleton with EPA blocks.
rest = EPA-model total − EPA blocks (21 × EPA block slope), since the
patch embedding / downsamplers / decoder / head are identical across
trans_block choices.
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from deformablelka_tpu.models.dlka_former import dlka_former_synapse
    from deformablelka_tpu.nn.transformer3d import TRANSFORMER_BLOCKS
    from deformablelka_tpu.utils.profiling import latency_bench_scan

    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    x = jnp.zeros((1, 64, 128, 128, 1), dt)

    m2 = dlka_former_synapse(num_classes=14, do_ds=False,
                             trans_block="TransformerBlock")
    v2 = jax.jit(m2.init)(rng, x)
    r = latency_bench_scan(lambda v, y: m2.apply(v, y), (v2, x),
                           reps=20, rounds=2)
    print(f"EPA model total: {r['mean_ms']:.1f} ms", flush=True)

    # per-stage EPA block slopes -> blocks total
    import time

    def slope(f, v, xx):
        ts = {}
        for n in (2, 6):
            def chain(v, xx, n=n):
                y = xx
                for _ in range(n):
                    y = f(v, y)
                return jnp.sum(y.astype(jnp.float32))
            fj = jax.jit(chain)
            np.asarray(fj(v, xx))
            t0 = time.time()
            for _ in range(5):
                out = fj(v, xx)
            np.asarray(out)
            ts[n] = (time.time() - t0) / 5 * 1000
        return (ts[6] - ts[2]) / 4

    rs = np.random.RandomState(0)
    total = 0.0
    for sp, dim, cnt in ((32, 32, 6), (16, 64, 6), (8, 128, 6),
                         (4, 256, 3)):
        xx = jnp.asarray(rs.randn(1, sp, sp, sp, dim) * 0.1, dt)
        blk = TRANSFORMER_BLOCKS["TransformerBlock"](
            input_size=sp ** 3, hidden_size=dim, proj_size=64)
        v = jax.jit(blk.init)(rng, xx)
        t = slope(lambda v, y: blk.apply(v, y), v, xx)
        total += t * cnt
        print(f"  EPA block {sp}^3 C{dim}: {t:.2f} ms x{cnt}", flush=True)
    print(f"EPA blocks total: {total:.1f} ms", flush=True)
    print(f"=> rest-of-model: {r['mean_ms'] - total:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
