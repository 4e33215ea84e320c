"""Round-4: re-probe bf16 x-tile blocks in the deform pallas kernel.

The v1-era Mosaic bisect (PERF.md constraint #5) found bf16 blocks
HTTP-500 the remote compiler; re-probed 2026-08-18 on v3, still
failing. Since then the compiler service demonstrably improved (the
pallas-in-value_and_grad crash vanished, probe_train_r4). bf16 tiles
would halve the xp4 materialisation (F shifted copies of the padded
volume) and the per-call tile HBM read — the biggest remaining traffic
in the v5x op.

Measures v5x at stage-0 (32^3 C32) and v5xw at stage-1 (16^3 C64),
DLKA_PALLAS_BF16_TILES 0 vs 1, same-session in-program slopes +
on-device parity. A model-level gate decides any default change.
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
    for tag, shape, fn in (
            ("stage0 32^3 C32", (32, 32, 32, 32), K._forward_v5x),
            ("stage1 16^3 C64", (16, 16, 16, 64), K._forward_v5xw),
    ):
        D, H, W, C = shape
        print(f"[{tag}]", flush=True)
        x = jnp.asarray(rs.randn(1, D, H, W, C) * 0.1, jnp.bfloat16)
        off = jnp.asarray(rs.randn(1, D, H, W, 81) * 0.3, jnp.bfloat16)
        w = jnp.asarray(rs.randn(3, 3, 3, C, C) * 0.1, jnp.bfloat16)
        outs = {}
        for mode in ("0", "1"):
            os.environ["DLKA_PALLAS_BF16_TILES"] = mode
            name = f"v5x tiles={'bf16' if mode == '1' else 'f32'}"
            try:
                outs[mode] = np.asarray(
                    jax.jit(lambda x, o, w: fn(x, o, w, 1))(x, off, w),
                    np.float32)
                slope(name, lambda y, o, w: fn(y, o, w, 1), x, off, w)
            except Exception as e:
                print(f"  {name}: FAIL {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
        if len(outs) == 2:
            d = np.max(np.abs(outs["0"] - outs["1"]))
            rel = d / (np.max(np.abs(outs["0"])) + 1e-9)
            print(f"  parity f32-vs-bf16 tiles: maxabs {d:.2e} "
                  f"rel {rel:.2e}", flush=True)
    os.environ.pop("DLKA_PALLAS_BF16_TILES", None)


if __name__ == "__main__":
    main()
