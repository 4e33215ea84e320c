"""Benchmark: 3D Synapse sliding-window inference throughput on TPU.

Measures end-to-end volumes/sec for the flagship D-LKA Former
(TransformerBlock_3D_single_deform_LKA, 42M params) with the reference's
exact inference protocol (neural_network.py:292-409): patch 64×128×128,
step 0.5, Gaussian blending, mirror TTA over all 3 axes (8 forwards/tile),
on a synthetic mid-size CT volume (128×256×256 ≈ 45 tiles).

`vs_baseline` divides by an assumed A100 reference of 0.10 volumes/sec
(≈10 s/volume with ×8 TTA — typical for nnUNet-class pipelines on this
protocol; the reference repo commits no timing numbers, BASELINE.md §
"Timing harnesses"). The north-star target is ≥5× on a v5e-8; this bench
runs on the single available chip.

Prints ONE JSON line.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: the driver's fresh-process bench run
    # reuses compiles warmed here. On the remote-compile axon backend a
    # cold compile of the tiled program is minutes, not seconds.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deformablelka_tpu.models.dlka_former import dlka_former_synapse
    from deformablelka_tpu.inference.sliding_window import SlidingWindowInference

    model = dlka_former_synapse(num_classes=14, do_ds=False)
    rng = jax.random.PRNGKey(0)
    patch = (64, 128, 128)
    x0 = jnp.zeros((1, *patch, 1), jnp.bfloat16)
    # init MUST be jitted: eager init on the remote (axon) backend pays a
    # tunnel round trip per op and takes tens of minutes.
    variables = jax.jit(model.init)(rng, x0)

    def apply_fn(params, x):
        return model.apply(params, x.astype(jnp.bfloat16))

    sw = SlidingWindowInference(apply_fn, patch_size=patch, num_classes=14,
                                step_size=0.5, do_mirroring=True)

    vol = np.random.RandomState(0).randn(128, 256, 256, 1).astype(np.float32)

    # Warmup (compile)
    t0 = time.time()
    sw.predict(variables, vol)
    warm = time.time() - t0

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        probs = sw.predict(variables, vol)
    dt = (time.time() - t0) / reps

    vols_per_sec = 1.0 / dt
    baseline_vps = 0.10  # assumed A100 reference (see module docstring)
    print(json.dumps({
        "metric": "synapse3d_sliding_window_volumes_per_sec",
        "value": round(vols_per_sec, 4),
        "unit": "volumes/sec/chip (128x256x256 vol, 64x128x128 patch, x8 TTA)",
        "vs_baseline": round(vols_per_sec / baseline_vps, 3),
    }))


if __name__ == "__main__":
    main()
