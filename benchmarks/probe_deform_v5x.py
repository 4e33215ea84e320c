"""Round-4: v5x compile + op-level A/B (v4 vs v5 vs v5x) at the real
stage-0 shape (32³ C32, R=1), plus v4w vs v5xw at stage-1 (16³ C64).

v5x = the v5 lane-packed kernel fed IN PLACE: the only question this
probe answers on-device is whether Mosaic accepts a (TZ, TY, TX, 3)
BlockSpec carved at lane offset 3k out of an 81-wide minor dim, and
what the op-level saving is once the v5 transpose is gone. A model-
level gate (benchmarks/gate_model_ab.py) decides the default.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N1, N2, REPS = 2, 6, 5


def slope(name, f, x, off, w):
    ts = {}
    for n in (N1, N2):
        def chain(x, off, w, n=n):
            y = x
            for _ in range(n):
                y = f(y, off, w).astype(x.dtype)
            return jnp.sum(y.astype(jnp.float32))
        fj = jax.jit(chain)
        np.asarray(fj(x, off, w))
        t0 = time.time()
        for _ in range(REPS):
            out = fj(x, off, w)
        np.asarray(out)
        ts[n] = (time.time() - t0) / REPS * 1000
    per = (ts[N2] - ts[N1]) / (N2 - N1)
    print(f"  {name}: {per:.3f} ms", flush=True)
    return per


def main():
    from deformablelka_tpu.ops.pallas import deform3d_kernel as K

    rs = np.random.RandomState(0)

    for tag, shape, fns in (
            ("stage0 32^3 C32",
             (32, 32, 32, 32),
             [("v4", K._forward_v4), ("v5", K._forward_v5),
              ("v5x", K._forward_v5x)]),
            ("stage1 16^3 C64",
             (16, 16, 16, 64),
             [("v4w", K._forward_v4w), ("v5xw", K._forward_v5xw)]),
    ):
        D, H, W, C = shape
        print(f"[{tag}]", flush=True)
        x = jnp.asarray(rs.randn(1, D, H, W, C) * 0.1, jnp.bfloat16)
        off = jnp.asarray(rs.randn(1, D, H, W, 81) * 0.3, jnp.bfloat16)
        w = jnp.asarray(rs.randn(3, 3, 3, C, C) * 0.1, jnp.bfloat16)
        outs = {}
        for name, fn in fns:
            try:
                outs[name] = np.asarray(
                    jax.jit(lambda x, o, w, fn=fn: fn(x, o, w, 1))(
                        x, off, w), np.float32)
                slope(name, lambda y, o, w, fn=fn: fn(y, o, w, 1),
                      x, off, w)
            except Exception as e:
                print(f"  {name}: FAIL {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
        names = list(outs)
        for other in names[1:]:
            d = np.max(np.abs(outs[names[0]] - outs[other]))
            print(f"  parity {names[0]} vs {other}: maxabs {d:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
