"""Bisect the remote-compile HTTP 500 on the window deform VJP.

The full flagship training step fails to compile on the axon TPU with
DLKA_DEFORM_IMPL=window|hybrid (PERF.md "Training step"); gather
compiles. This probes successively larger compositions so the crash can
be attributed to an op, a shape, or the composition:

  1. grad of a single deform_conv3d_window op, flagship stage shapes
  2. grad through one deformable LKA3d chain (dw5 -> window deform)
  3. grad through one TransformerBlock_3D_single_deform_LKA analog
  4. grad through the full model WITHOUT remat
  5. (known-fail baseline) full train step

Each case runs in this one process sequentially; a compiler crash
raises and is caught, so later cases still run. Usage:
    python benchmarks/probe_window_vjp.py [case ...]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("DLKA_DEFORM_IMPL", "window")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def run(name, fn, *args):
    t0 = time.time()
    try:
        out = jax.jit(fn)(*args)
        jax.tree_util.tree_map(
            lambda a: np.asarray(a) if hasattr(a, "shape") else a, out)
        print(f"{name}: OK ({time.time() - t0:.0f}s)", flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:160]}", flush=True)
        return False


def case_op(shape=(1, 32, 64, 64, 64)):
    from deformablelka_tpu.ops.deform3d import deform_conv3d_window
    B, D, H, W, C = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, D, H, W, C), jnp.bfloat16)
    off = jnp.asarray(rng.randn(B, D, H, W, 81) * 0.3, jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 3, 1, C), jnp.bfloat16)

    def loss(x, off, w):
        return jnp.sum(deform_conv3d_window(
            x, off, w, None, padding=1, groups=C, radius=1)
            .astype(jnp.float32))

    return run(f"1-op grad {shape}", jax.grad(loss, argnums=(0, 1, 2)),
               x, off, w)


def case_block():
    from deformablelka_tpu.nn.transformer3d import TRANSFORMER_BLOCKS
    D, H, W, C = 32, 64, 64, 64
    blk = TRANSFORMER_BLOCKS["TransformerBlock_3D_single_deform_LKA"](
        input_size=D * H * W, hidden_size=C, proj_size=64)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, D, H, W, C), jnp.bfloat16)
    variables = jax.jit(blk.init)(jax.random.PRNGKey(0), x)

    def loss(params, x):
        v = {"params": params}
        if "batch_stats" in variables:
            v["batch_stats"] = variables["batch_stats"]
        return jnp.sum(blk.apply(v, x).astype(jnp.float32))

    return run("block grad", jax.grad(loss), variables["params"], x)


def case_model(remat):
    from deformablelka_tpu.models.dlka_former import dlka_former_synapse
    model = dlka_former_synapse(num_classes=14, do_ds=False, remat=remat)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 128, 128, 1), jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    def loss(params, x):
        out = model.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            x, mutable=["batch_stats"])[0]
        return jnp.sum(out.astype(jnp.float32))

    return run(f"model grad remat={remat}", jax.grad(loss),
               variables["params"], x)


CASES = {
    "op": lambda: case_op(),
    "op_small": lambda: case_op((1, 16, 32, 32, 32)),
    "block": case_block,
    "model": lambda: case_model(False),
    "model_remat": lambda: case_model(True),
}


if __name__ == "__main__":
    names = sys.argv[1:] or ["op_small", "op", "block"]
    for n in names:
        CASES[n]()
