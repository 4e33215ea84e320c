"""2D inference-speed benchmark — the reference's A100 harness on TPU.

Mirrors /root/reference/2D/test_inference_speed.py:23-55: batch-1
1×224×224 forward on the 2D flagship (MaxViT D-LKA Net), 50 warmup +
1000 timed reps, mean ± std latency. Prints ONE JSON line like bench.py.

`vs_baseline` divides by an assumed A100 reference of 25 ms/img for this
~20 GFLOP model under the same harness (no number is committed in the
reference repo; BASELINE.md "Timing harnesses").
"""

import json


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from deformablelka_tpu.models.maxvit_dlka import (
        MaxViTDeformableLKAFormer)
    from deformablelka_tpu.utils.profiling import (latency_bench,
                                                   latency_bench_scan)

    model = MaxViTDeformableLKAFormer(num_classes=9)
    x = jnp.zeros((1, 224, 224, 1), jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    def fwd(v, x):
        return model.apply(v, x)

    # device-only time (scan of 100 forwards in one program) = the
    # CUDA-event analog; host-loop number kept for reference
    r = latency_bench_scan(fwd, (variables, x), reps=100, rounds=5)
    rh = latency_bench(fwd, (variables, x), warmup=20, reps=100)
    baseline_ms = 25.0
    print(json.dumps({
        "metric": "synapse2d_batch1_latency_ms",
        "value": round(r["mean_ms"], 3),
        "unit": (f"ms/img device-time (224x224, bf16, std "
                 f"{r['std_ms']:.3f}; host-loop incl. dispatch "
                 f"{rh['mean_ms']:.1f})"),
        "vs_baseline": round(baseline_ms / r["mean_ms"], 3),
    }))


if __name__ == "__main__":
    main()
