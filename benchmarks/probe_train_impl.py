"""Probe: does the 3D flagship training step compile+run on the real
TPU under a given DLKA_DEFORM_IMPL, and how fast is it?

Usage: DLKA_DEFORM_IMPL=window python benchmarks/probe_train_impl.py [B] [remat]

Isolates the remote-compile HTTP 500 seen with the hybrid default
(PERF.md "Training step"). One config per process so a compiler crash
doesn't poison the rest.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    remat = (sys.argv[2] != "0") if len(sys.argv) > 2 else True
    impl = os.environ.get("DLKA_DEFORM_IMPL", "hybrid")

    from deformablelka_tpu.models.dlka_former import dlka_former_synapse
    from deformablelka_tpu.training.train_step import (
        make_sgd, make_train_step, init_train_state)
    from deformablelka_tpu.training.losses import poly_lr

    patch = (64, 128, 128)
    rng = jax.random.PRNGKey(0)
    model = dlka_former_synapse(num_classes=14, do_ds=True, remat=remat)
    x = jnp.zeros((B, *patch, 1), jnp.bfloat16)
    variables = jax.jit(model.init)(rng, x)
    tx = make_sgd(lambda s: poly_lr(0, 1000, 1e-2), momentum=0.99,
                  nesterov=True, clip_norm=12.0)
    state = init_train_state(variables, tx)
    step = jax.jit(make_train_step(model.apply, tx, deep_supervision=True))
    batch = {
        "image": jnp.asarray(
            np.random.RandomState(0).randn(B, *patch, 1), jnp.bfloat16),
        "label": jnp.asarray(
            np.random.RandomState(1).randint(0, 14, (B, *patch)), jnp.int32),
    }
    t0 = time.time()
    try:
        state, m = step(state, batch)
        loss = float(np.asarray(m["loss"]))
    except Exception as e:
        print(f"impl={impl} B={B} remat={remat}: FAILED {str(e)[:200]}",
              flush=True)
        return 1
    warm = time.time() - t0
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        state, m = step(state, batch)
    loss = float(np.asarray(m["loss"]))
    dt = (time.time() - t0) / reps
    print(f"impl={impl} B={B} remat={remat}: {dt*1000:.0f} ms/step "
          f"({B/dt:.3f} samples/sec; compile+warm {warm:.0f}s; "
          f"loss {loss:.4f})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
