"""Round-4 training-step attack (VERDICT r3 task #3).

Three questions, one session:
 1. Where do the 3.56 s/step (batch 2) go? — forward-only loss vs
    value_and_grad vs full optimizer step, same shapes.
 2. Does the pallas forward inside value_and_grad still HTTP-500 the
    remote compiler? Minimal repro: ONE DeformConvPack3d layer, grad of
    sum, impl=hybrid (pallas fast branch), growing shapes. (PERF.md
    "Fast-mode training"; the custom VJP delegates backward to the
    window path, so only the forward kernel differs.)
 3. Train-impl matrix at the flagship config: hybridw (default) vs
    hybrid (pallas fast branch, if #2 compiles) vs window-R2 vs gather.

Usage: python benchmarks/probe_train_r4.py [repro|profile|matrix|all]
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _sync(x):
    import numpy as np
    import jax
    return np.asarray(jax.tree.leaves(x)[0])


def repro():
    """Minimal pallas-in-value_and_grad repro, growing shapes."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from deformablelka_tpu import ops
    from deformablelka_tpu.nn.blocks3d import DeformConvPack3d

    results = {}
    for shape, C in (((16, 32, 32), 32), ((32, 64, 64), 32),
                     ((32, 64, 64), 64)):
        model = DeformConvPack3d()
        x = jnp.asarray(
            np.random.RandomState(0).randn(1, *shape, C) * 0.1,
            jnp.bfloat16)
        v = jax.jit(model.init)(jax.random.PRNGKey(0), x)

        def loss(v, x):
            with ops.deform_impl("hybrid"):
                return jnp.sum(model.apply(v, x).astype(jnp.float32))

        key = f"{shape}xC{C}"
        try:
            g = jax.jit(jax.grad(loss))(v, x)
            _sync(g)
            results[key] = "ok"
        except Exception as e:
            results[key] = f"{type(e).__name__}: {str(e)[:200]}"
        print(f"[repro] hybrid(pallas-fast) grad {key}: {results[key]}",
              file=sys.stderr, flush=True)
    return results


def _flagship_step(train_impl=None, batch=2, remat=True, do_ds=True):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from deformablelka_tpu.models.dlka_former import dlka_former_synapse
    from deformablelka_tpu.training.train_step import (
        make_sgd, make_train_step, init_train_state)
    from deformablelka_tpu.training.losses import poly_lr

    if train_impl is not None:
        os.environ["DLKA_DEFORM_IMPL_TRAIN"] = train_impl
    else:
        os.environ.pop("DLKA_DEFORM_IMPL_TRAIN", None)
    patch = (64, 128, 128)
    rng = jax.random.PRNGKey(0)
    model = dlka_former_synapse(num_classes=14, do_ds=do_ds, remat=remat)
    x = jnp.zeros((batch, *patch, 1), jnp.bfloat16)
    variables = jax.jit(model.init)(rng, x)
    tx = make_sgd(lambda s: poly_lr(0, 1000, 1e-2), momentum=0.99,
                  nesterov=True, clip_norm=12.0)
    state = init_train_state(variables, tx)
    step = jax.jit(make_train_step(model.apply, tx,
                                   deep_supervision=do_ds))
    batch_d = {
        "image": jnp.asarray(
            np.random.RandomState(0).randn(batch, *patch, 1),
            jnp.bfloat16),
        "label": jnp.asarray(
            np.random.RandomState(1).randint(0, 14, (batch, *patch)),
            jnp.int32),
    }
    return state, step, batch_d, model, variables


def _time_step(state, step, batch_d, reps=3):
    import numpy as np
    t0 = time.time()
    state, m = step(state, batch_d)
    np.asarray(m["loss"])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        state, m = step(state, batch_d)
    np.asarray(m["loss"])
    return (time.time() - t0) / reps, compile_s, float(np.asarray(m["loss"]))


def profile():
    """Forward-only vs full step at the flagship config."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from deformablelka_tpu import ops
    from deformablelka_tpu.training.losses import deep_supervision_loss

    out = {}
    state, step, batch_d, model, variables = _flagship_step()
    s_per, compile_s, loss = _time_step(state, step, batch_d)
    out["full_step_default"] = {"s": round(s_per, 3),
                                "compile_s": round(compile_s, 1),
                                "loss": round(loss, 4)}
    print(f"[profile] full step: {out['full_step_default']}",
          file=sys.stderr, flush=True)

    # forward-only loss (same remat model, same loss math, no grad)
    def loss_only(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        with ops.deform_impl(ops.train_impl()):
            outs, _ = model.apply(variables, batch["image"],
                                  mutable=["batch_stats"])
        return deep_supervision_loss(outs, batch["label"])

    f = jax.jit(loss_only)
    np.asarray(f(state.params, state.batch_stats, batch_d))
    t0 = time.time()
    for _ in range(3):
        l = f(state.params, state.batch_stats, batch_d)
    np.asarray(l)
    out["forward_loss_only"] = round((time.time() - t0) / 3, 3)
    print(f"[profile] forward-only loss: {out['forward_loss_only']} s",
          file=sys.stderr, flush=True)
    return out


def matrix():
    out = {}
    for impl in ("hybridw", "hybrid", "gather"):
        try:
            state, step, batch_d, _, _ = _flagship_step(train_impl=impl)
            s_per, compile_s, loss = _time_step(state, step, batch_d)
            out[impl] = {"s": round(s_per, 3), "loss": round(loss, 4),
                         "compile_s": round(compile_s, 1)}
        except Exception as e:
            out[impl] = f"{type(e).__name__}: {str(e)[:160]}"
        print(f"[matrix] {impl}: {out[impl]}", file=sys.stderr, flush=True)
    return out


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    report = {}
    if what in ("repro", "all"):
        report["repro"] = repro()
    if what in ("profile", "all"):
        report["profile"] = profile()
    if what in ("matrix", "all"):
        report["matrix"] = matrix()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
