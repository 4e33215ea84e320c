"""3D training-step throughput on TPU: fwd+bwd+SGD at the reference's
training config (64x128x128 patch, deep supervision, nesterov 0.99,
grad-clip 12 — d_lka_former_trainer_synapse.py:49-58).

Prints samples/sec for batch 1 and 2 (the reference trains batch 2).
Sync: scalar loss fetched to host (block_until_ready is a no-op on the
tunneled axon backend — PERF.md)."""

import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from deformablelka_tpu.models.dlka_former import dlka_former_synapse
    from deformablelka_tpu.training.train_step import (
        make_sgd, make_train_step, init_train_state)
    from deformablelka_tpu.training.losses import poly_lr

    patch = (64, 128, 128)
    rng = jax.random.PRNGKey(0)

    for B, remat in ((1, False), (1, True), (2, True)):
        model = dlka_former_synapse(num_classes=14, do_ds=True,
                                    remat=remat)
        x = jnp.zeros((B, *patch, 1), jnp.bfloat16)
        variables = jax.jit(model.init)(rng, x)
        tx = make_sgd(lambda s: poly_lr(0, 1000, 1e-2), momentum=0.99,
                      nesterov=True, clip_norm=12.0)
        state = init_train_state(variables, tx)
        step = jax.jit(make_train_step(model.apply, tx,
                                       deep_supervision=True))
        batch = {
            "image": jnp.asarray(
                np.random.RandomState(0).randn(B, *patch, 1), jnp.bfloat16),
            "label": jnp.asarray(
                np.random.RandomState(1).randint(0, 14, (B, *patch)),
                jnp.int32),
        }
        t0 = time.time()
        try:
            state, m = step(state, batch)
            np.asarray(m["loss"])
        except Exception as e:
            print(f"batch {B} remat={remat}: FAILED "
                  f"{str(e)[:140]}", flush=True)
            continue
        warm = time.time() - t0
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            state, m = step(state, batch)
        np.asarray(m["loss"])
        dt = (time.time() - t0) / reps
        print(f"batch {B} remat={remat}: {dt*1000:.0f} ms/step "
              f"({B/dt:.3f} samples/sec; compile+warm {warm:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
