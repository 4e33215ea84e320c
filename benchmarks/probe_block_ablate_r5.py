"""Round-5 in-context attribution by block-variant swap: full-flagship
device forward (latency_bench_scan, same protocol as gate_model_ab)
with the trans_block swapped. Deltas vs the shipped
TransformerBlock_3D_single_deform_LKA give the IN-CONTEXT cost of the
deform pack / the LKA gate — the dissects' isolated slopes have now
misled three times (zdecomp r3, unroll r5, atrous r5)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from deformablelka_tpu.models.dlka_former import dlka_former_synapse
    from deformablelka_tpu.utils.profiling import latency_bench_scan

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 128, 128, 1), jnp.bfloat16)
    for name in ("TransformerBlock_3D_single_deform_LKA",
                 "TransformerBlock_3D_LKA",
                 "TransformerBlock"):
        model = dlka_former_synapse(num_classes=14, do_ds=False,
                                    trans_block=name)
        v = jax.jit(model.init)(rng, x)
        r = latency_bench_scan(lambda vv, xx: model.apply(vv, xx),
                               (v, x), reps=20, rounds=2)
        print(f"  {name}: {r['mean_ms']:.2f} ms/fwd", flush=True)


if __name__ == "__main__":
    main()
