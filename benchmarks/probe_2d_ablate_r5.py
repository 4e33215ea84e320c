"""Round-5 2D in-context attribution by variant swap: full
MaxViTDeformableLKAFormer vs deformable=False (the paper's LKA
baseline — same decoder minus offset nets + deform sampling; NOTE the
baseline also reuses layer_lka_1 twice per the reference quirk, so
the delta includes one block's worth of structural difference) vs
encoder-only. Same latency_bench_scan protocol as gate --model=2d."""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from deformablelka_tpu.models.maxvit_dlka import (
        MaxViTDeformableLKAFormer)
    from deformablelka_tpu.utils.profiling import latency_bench_scan

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 224, 224, 1), jnp.bfloat16)
    for name, model in (
            ("deform flagship", MaxViTDeformableLKAFormer(num_classes=9)),
            ("LKA baseline (deformable=False)",
             MaxViTDeformableLKAFormer(num_classes=9, deformable=False)),
    ):
        v = jax.jit(model.init)(rng, x)
        r = latency_bench_scan(lambda vv, xx: model.apply(vv, xx),
                               (v, x), reps=100, rounds=2)
        print(f"  {name}: {r['mean_ms']:.2f} ms/fwd", flush=True)


if __name__ == "__main__":
    main()
