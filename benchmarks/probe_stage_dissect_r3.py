"""Dissect the deform-block cost at stages 0/1 this session: dw5 and
dw7d3 separately (lax emitter health check), the fused pallas dw-chain,
the deform pack, and the block minus its LKA gate. Run on the live TPU.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N1, N2, REPS = 2, 8, 5


def slope(name, f, *args):
    ts = {}
    for n in (N1, N2):
        def chain(*a, n=n):
            y = a[-1]
            for _ in range(n):
                y = f(*a[:-1], y)
            return jnp.sum(y.astype(jnp.float32))
        fj = jax.jit(chain)
        np.asarray(fj(*args))
        t0 = time.time()
        for _ in range(REPS):
            out = fj(*args)
        np.asarray(out)
        ts[n] = (time.time() - t0) / REPS * 1000
    per = (ts[N2] - ts[N1]) / (N2 - N1)
    print(f"  {name}: {per:.3f} ms", flush=True)
    return per


def main():
    from deformablelka_tpu.ops import depthwise_conv3d
    from deformablelka_tpu.nn import blocks3d as B3
    import flax.linen as nn

    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    rs = np.random.RandomState(0)

    for sp, dim in [(32, 32), (16, 64), (8, 128)]:
        print(f"stage {sp}^3 C{dim}:", flush=True)
        x = jnp.asarray(rs.randn(1, sp, sp, sp, dim) * 0.1, dt)
        w5 = jnp.asarray(rs.randn(5, 5, 5, 1, dim) * 0.05, jnp.float32)
        w7 = jnp.asarray(rs.randn(7, 7, 7, 1, dim) * 0.05, jnp.float32)

        slope("dw5 lax", lambda w, y: depthwise_conv3d(
            y, w, padding=2).astype(dt), w5, x)
        slope("dw7d3 lax", lambda w, y: depthwise_conv3d(
            y, w, padding=9, dilation=3).astype(dt), w7, x)

        # bf16 weights variant
        slope("dw5 lax bf16w", lambda w, y: depthwise_conv3d(
            y, w.astype(dt), padding=2).astype(dt), w5, x)
        slope("dw7d3 lax bf16w", lambda w, y: depthwise_conv3d(
            y, w.astype(dt), padding=9, dilation=3).astype(dt), w7, x)

        try:
            from deformablelka_tpu.ops.pallas.lka_fused_kernel import (
                dw_chain3d_fused, lka3d_fused_supported)
            if lka3d_fused_supported(sp, sp, sp):
                b5 = jnp.zeros((dim,), jnp.float32)
                b7 = jnp.zeros((dim,), jnp.float32)
                slope("dw-chain fused pallas",
                      lambda y: dw_chain3d_fused(
                          y, w5, b5, w7, b7).astype(dt), x)
            else:
                print("  dw-chain fused pallas: unsupported", flush=True)
        except Exception as e:
            print(f"  dw-chain fused pallas: {type(e).__name__}",
                  flush=True)

        d = B3.DeformConvPack3d()
        v = jax.jit(d.init)(rng, x)
        slope("DeformConvPack3d", lambda v, y: d.apply(v, y), v, x)

        class Gate(nn.Module):
            """LKA3dDeform attention gate alone (no block skeleton)."""
            @nn.compact
            def __call__(self, y):
                return B3.LKA3dDeform()(y)
        try:
            m = Gate()
            v = jax.jit(m.init)(rng, x)
            slope("LKA3dDeform gate", lambda v, y: m.apply(v, y), v, x)
        except Exception as e:
            print(f"  LKA3dDeform gate: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
