"""On-device A/B: fused-LKA Pallas chain vs the XLA two-conv chain.

Usage: python benchmarks/bench_lka_fused.py [op3d] [op2d] [model]

`op3d`/`op2d`: per-op parity + chained-slope device timing of
dw_chain{3,2}d at the flagship LKA sites. `model`: end-to-end flagship
tile forward with DLKA_LKA_IMPL=fused vs default (same session).
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


def slope_time(fn, args, reps=24):
    """Device time per call via chained scan (excludes dispatch)."""
    import functools

    @functools.partial(jax.jit, static_argnums=())
    def chain(x0):
        def body(c, _):
            return jax.tree.map(
                lambda a, b: a + 0.0 * b, c, fn(*((c,) + args[1:]))), None
        c, _ = jax.lax.scan(body, x0, None, length=reps)
        return c

    # warm
    y = chain(args[0]); jax.block_until_ready(y)
    t0 = time.time(); y = chain(args[0]); jax.block_until_ready(y)
    return (time.time() - t0) / reps * 1e3


def op3d():
    from deformablelka_tpu.ops.pallas.lka_fused_kernel import (
        dw_chain3d_fused)
    from deformablelka_tpu.ops.pallas.lka_fused_kernel import _chain3d_ref
    rng = np.random.RandomState(0)
    for (sp, C) in [((32, 32, 32), 32), ((16, 16, 16), 64),
                    ((8, 8, 8), 128), ((4, 4, 4), 256)]:
        x = jnp.asarray(rng.randn(1, *sp, C), jnp.bfloat16)
        w5 = jnp.asarray(rng.randn(5, 5, 5, 1, C), jnp.float32) * .2
        b5 = jnp.asarray(rng.randn(C), jnp.float32)
        w7 = jnp.asarray(rng.randn(7, 7, 7, 1, C), jnp.float32) * .1
        b7 = jnp.asarray(rng.randn(C), jnp.float32)
        try:
            yf = jax.jit(dw_chain3d_fused)(x, w5, b5, w7, b7)
            yr = jax.jit(_chain3d_ref)(
                x.astype(jnp.float32), w5, b5, w7, b7)
            err = float(jnp.max(jnp.abs(yf.astype(jnp.float32) - yr)))
            scale = float(jnp.max(jnp.abs(yr)))
            tf = slope_time(
                lambda x, *a: dw_chain3d_fused(x, *a).astype(x.dtype),
                (x, w5, b5, w7, b7))
            tr = slope_time(
                lambda x, *a: _chain3d_ref(x, *a).astype(x.dtype),
                (x, w5, b5, w7, b7))
            print(f"3D {sp} C{C}: fused {tf:.2f} ms, xla {tr:.2f} ms, "
                  f"relerr {err/scale:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"3D {sp} C{C}: FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


def op2d():
    from deformablelka_tpu.ops.pallas.lka_fused_kernel import (
        dw_chain2d_fused, _chain2d_ref)
    rng = np.random.RandomState(0)
    for (sp, C) in [((56, 56), 96), ((28, 28), 192), ((14, 14), 384)]:
        x = jnp.asarray(rng.randn(1, *sp, C), jnp.bfloat16)
        w5 = jnp.asarray(rng.randn(5, 5, 1, C), jnp.float32) * .2
        b5 = jnp.asarray(rng.randn(C), jnp.float32)
        w7 = jnp.asarray(rng.randn(7, 7, 1, C), jnp.float32) * .1
        b7 = jnp.asarray(rng.randn(C), jnp.float32)
        try:
            yf = jax.jit(dw_chain2d_fused)(x, w5, b5, w7, b7)
            yr = jax.jit(_chain2d_ref)(
                x.astype(jnp.float32), w5, b5, w7, b7)
            err = float(jnp.max(jnp.abs(yf.astype(jnp.float32) - yr)))
            scale = float(jnp.max(jnp.abs(yr)))
            tf = slope_time(
                lambda x, *a: dw_chain2d_fused(x, *a).astype(x.dtype),
                (x, w5, b5, w7, b7))
            tr = slope_time(
                lambda x, *a: _chain2d_ref(x, *a).astype(x.dtype),
                (x, w5, b5, w7, b7))
            print(f"2D {sp} C{C}: fused {tf:.2f} ms, xla {tr:.2f} ms, "
                  f"relerr {err/scale:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"2D {sp} C{C}: FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


def model():
    from deformablelka_tpu.models.dlka_former import dlka_former_synapse
    model = dlka_former_synapse(num_classes=14, do_ds=False)
    x = jnp.zeros((1, 64, 128, 128, 1), jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    from deformablelka_tpu.utils.profiling import latency_bench_scan
    for impl in ("chain", "fused"):
        os.environ["DLKA_LKA_IMPL"] = impl
        try:
            r = latency_bench_scan(lambda v, x: model.apply(v, x),
                                   (variables, x), reps=10, rounds=2)
            print(f"model impl={impl}: {r['mean_ms']:.1f} ms/fwd "
                  f"(scan device-time)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"model impl={impl}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
        finally:
            jax.clear_caches()




def model2d():
    """LKA-baseline 2D model (non-deform decoder = AttentionModule
    chain sites at 56/28/14/7) fused vs chain."""
    from deformablelka_tpu.models.maxvit_dlka import maxvit_lka_former
    m = maxvit_lka_former(num_classes=9)
    x = jnp.zeros((1, 224, 224, 1), jnp.bfloat16)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    from deformablelka_tpu.utils.profiling import latency_bench_scan
    for impl in ("chain", "fused"):
        os.environ["DLKA_LKA_IMPL"] = impl
        try:
            r = latency_bench_scan(lambda v, x: m.apply(v, x), (v, x),
                                   reps=50, rounds=2)
            print(f"model2d impl={impl}: {r['mean_ms']:.2f} ms/img",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"model2d impl={impl}: FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
        finally:
            jax.clear_caches()


if __name__ == "__main__":
    names = sys.argv[1:] or ["op3d", "op2d", "model"]
    print("backend:", jax.default_backend(), flush=True)
    for n in names:
        globals()[n]()
