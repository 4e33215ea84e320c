"""Dissect the training backward (3.3 of the 3.56 s/step, batch 2).

In-program slopes of value_and_grad on isolated modules at the real
stage shapes (B=2), plus a full train step with the NON-deform
TransformerBlock_3D_LKA to bound the deform-VJP share from above.

Usage: python benchmarks/probe_train_bwd_r4.py [modules|lka|all]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N1, N2, REPS = 1, 3, 5


def grad_slope(name, make_loss, v, x):
    """Slope-time chained value_and_grad: y_{i+1} = x + eps*dL/dx(y_i)."""
    ts = {}
    for n in (N1, N2):
        def chain(v, x, n=n):
            y = x
            for _ in range(n):
                g = jax.grad(make_loss, argnums=1)(v, y)
                y = x + 1e-6 * g.astype(x.dtype)
            return jnp.sum(y.astype(jnp.float32))
        fj = jax.jit(chain)
        np.asarray(fj(v, x))
        t0 = time.time()
        for _ in range(REPS):
            out = fj(v, x)
        np.asarray(out)
        ts[n] = (time.time() - t0) / REPS * 1000
    per = (ts[N2] - ts[N1]) / (N2 - N1)
    print(f"  {name}: {per:.3f} ms/grad", file=sys.stderr, flush=True)
    return round(per, 3)


def modules():
    from deformablelka_tpu import ops
    from deformablelka_tpu.nn.blocks3d import DeformConvPack3d
    from deformablelka_tpu.nn.dynunet import UnetResBlock
    from deformablelka_tpu.ops import lka3d

    rs = np.random.RandomState(0)
    dt = jnp.bfloat16
    out = {}
    B = 2
    for sp, C in ((32, 32), (16, 64), (8, 128)):
        x = jnp.asarray(rs.randn(B, sp, sp, sp, C) * 0.1, dt)
        m = DeformConvPack3d()
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)

        def loss(v, y, m=m):
            with ops.deform_impl("hybridw"):
                return jnp.sum(m.apply(v, y).astype(jnp.float32))

        out[f"deformpack_grad_{sp}c{C}"] = grad_slope(
            f"DeformConvPack3d grad {sp}^3 C{C} (hybridw)", loss, v, x)

        def loss_p(v, y, m=m):
            with ops.deform_impl("hybrid"):
                return jnp.sum(m.apply(v, y).astype(jnp.float32))

        out[f"deformpack_grad_{sp}c{C}_pallasfwd"] = grad_slope(
            f"DeformConvPack3d grad {sp}^3 C{C} (hybrid/pallas fwd)",
            loss_p, v, x)
    return out


def lka_step():
    """Full train step with the non-deform 3D_LKA block (upper-bounds
    everything except the deform VJPs)."""
    from benchmarks.probe_train_r4 import _flagship_step, _time_step
    import os

    out = {}
    for tb in ("TransformerBlock_3D_LKA", "TransformerBlock"):
        from deformablelka_tpu.models.dlka_former import dlka_former_synapse
        from deformablelka_tpu.training.train_step import (
            make_sgd, make_train_step, init_train_state)
        from deformablelka_tpu.training.losses import poly_lr
        B, patch = 2, (64, 128, 128)
        model = dlka_former_synapse(num_classes=14, do_ds=True,
                                    remat=True, trans_block=tb)
        x = jnp.zeros((B, *patch, 1), jnp.bfloat16)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        tx = make_sgd(lambda s: poly_lr(0, 1000, 1e-2), momentum=0.99,
                      nesterov=True, clip_norm=12.0)
        state = init_train_state(variables, tx)
        step = jax.jit(make_train_step(model.apply, tx,
                                       deep_supervision=True))
        batch_d = {
            "image": jnp.asarray(
                np.random.RandomState(0).randn(B, *patch, 1),
                jnp.bfloat16),
            "label": jnp.asarray(
                np.random.RandomState(1).randint(0, 14, (B, *patch)),
                jnp.int32),
        }
        s_per, compile_s, loss = _time_step(state, step, batch_d)
        out[tb] = {"s": round(s_per, 3), "compile_s": round(compile_s, 1)}
        print(f"  step[{tb}]: {out[tb]}", file=sys.stderr, flush=True)
    return out


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    report = {}
    if what in ("modules", "all"):
        report["modules"] = modules()
    if what in ("lka", "all"):
        report["lka_step"] = lka_step()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
