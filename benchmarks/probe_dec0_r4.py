"""Round-4 dissection of the 2D flagship's decoder_0 (96@56² — 2.95 of
the 5.3 ms full-model slope, profile_2d_r3 2026-08-20). Splits the
stage into: deformableLKABlock, attention, each DeformConv (5×5 K25,
7×7d3 K49), offset_net conv alone, bare deform_conv2d window op, Mlp,
and the FinalPatchExpand(56→224)+head tail.

Harness being beaten: 2D/test_inference_speed.py:23-55 (target
≤5.0 ms/img = 5× the assumed 25 ms A100).
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


def slope(name, f, v, x):
    ts = {}
    for n in (N1, N2):
        def chain(v, x, n=n):
            y = x
            for _ in range(n):
                y = f(v, y)
            return jnp.sum(y.astype(jnp.float32))
        fj = jax.jit(chain)
        np.asarray(fj(v, x))
        t0 = time.time()
        for _ in range(REPS):
            out = fj(v, x)
        np.asarray(out)
        ts[n] = (time.time() - t0) / REPS * 1000
    per = (ts[N2] - ts[N1]) / (N2 - N1)
    print(f"  {name}: {per:.3f} ms", flush=True)
    return per


def main():
    import flax.linen as nn
    from deformablelka_tpu.nn.lka2d import (
        deformableLKABlock, deformable_LKA_Attention, DeformConv, Mlp)
    from deformablelka_tpu.models.maxvit_dlka import FinalPatchExpand_X4
    from deformablelka_tpu.nn.layers import Conv2d
    from deformablelka_tpu.ops import deform_conv2d

    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 56, 56, 96) * 0.1, dt)

    def probe_mod(name, mod, x):
        v = jax.jit(mod.init)(rng, x)

        def f(v, y):
            out = mod.apply(v, y)
            if out.shape != y.shape:
                s = jnp.mean(out.astype(jnp.float32))
                return (y + s.astype(dt)).astype(dt)
            return out.astype(dt)
        return slope(name, f, v, x)

    probe_mod("deformableLKABlock 96@56", deformableLKABlock(), x)
    probe_mod("  attn (deformable_LKA_Attention)",
              deformable_LKA_Attention(), x)
    probe_mod("    DeformConv 5x5 K25", DeformConv(
        kernel_size=(5, 5), padding=2, groups=96), x)
    probe_mod("    DeformConv 7x7d3 K49", DeformConv(
        kernel_size=(7, 7), padding=9, dilation=3, groups=96), x)
    probe_mod("    offset_net 5x5 (2K=50 out)", Conv2d(
        50, (5, 5), padding=2, use_bias=True), x)
    probe_mod("    offset_net 7x7d3 (2K=98 out)", Conv2d(
        98, (7, 7), padding=9, dilation=3, use_bias=True), x)
    probe_mod("  Mlp h=384", Mlp(hidden_features=384), x)
    probe_mod("  tail FinalPatchExpand+head",
              nn.Sequential([FinalPatchExpand_X4(), Conv2d(9, 1)]), x)

    # bare window ops with precomputed offsets
    for (k, dil, pad) in ((5, 1, 2), (7, 3, 9)):
        K = k * k
        off = jnp.asarray(rs.randn(1, 56, 56, 2 * K) * 0.3, jnp.float32)
        w = jnp.asarray(rs.randn(k, k, 1, 96) * 0.05, jnp.float32)

        def f(v, y, off=off, w=w, pad=pad, dil=dil):
            out = deform_conv2d(y, off, w, None, stride=1, padding=pad,
                                dilation=dil, groups=96)
            return out.astype(dt)
        slope(f"  bare deform_conv2d {k}x{k}d{dil}", f, None, x)


if __name__ == "__main__":
    main()
