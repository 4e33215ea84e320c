"""Round-3 2D session profile: in-program slope of the 2D flagship's
components at batch-1 224² — encoder (MaxViT4Out) vs the four decoder
layers vs the full model. Tells us where the ~5.9 ms/img lives this
session (VERDICT r2 item 4: target ≤5.0 ms = ≥5× the assumed A100
25 ms; harness parity: 2D/test_inference_speed.py:23-55).
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
    from deformablelka_tpu.models.maxvit import MaxViT4Out
    from deformablelka_tpu.models.maxvit_dlka import (
        DecoderLayer, MaxViTDeformableLKAFormer)

    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    rs = np.random.RandomState(0)

    # full model
    model = MaxViTDeformableLKAFormer(num_classes=9)
    x = jnp.asarray(rs.randn(1, 224, 224, 1) * 0.1, dt)
    v = jax.jit(model.init)(rng, x)

    def full(v, y):
        out = model.apply(v, y)
        # keep the chain same-shaped: reduce logits back to an image
        return jnp.broadcast_to(
            jnp.mean(out, axis=-1, keepdims=True), y.shape).astype(dt)
    slope("full model (chained)", full, v, x)

    # encoder alone
    enc = MaxViT4Out(img_size=224)
    x3 = jnp.asarray(rs.randn(1, 224, 224, 3) * 0.1, dt)
    ve = jax.jit(enc.init)(rng, x3)

    def enc_f(v, y):
        feats = enc.apply(v, y)
        s = sum(jnp.mean(f.astype(jnp.float32)) for f in feats)
        return (y + s.astype(dt)).astype(dt)
    slope("encoder MaxViT4Out", enc_f, ve, x3)

    # decoder layers at their real shapes
    dims = [(768, 7, None), (384, 14, 384), (192, 28, 192), (96, 56, 96)]
    for i, (dim, sp, skip_c) in enumerate(dims):
        lyr = DecoderLayer(out_dim=dim, n_class=9, deterministic=True,
                           deformable=True, is_last=(i == 3))
        # decoder_3 takes only x1 at /32; others take (x1, skip)
        if skip_c is None:
            xi = jnp.asarray(rs.randn(1, sp, sp, dim) * 0.1, dt)
            vi = jax.jit(lyr.init)(rng, xi)

            def f(v, y, lyr=lyr):
                out = lyr.apply(v, y)
                s = jnp.mean(out.astype(jnp.float32))
                return (y + s.astype(dt)).astype(dt)
            slope(f"decoder_{3 - i} ({dim}@{sp})", f, vi, xi)
        else:
            # x1 arrives token-shaped from the previous layer's expand
            xi = jnp.asarray(rs.randn(1, sp, sp, dim) * 0.1, dt)
            sk = jnp.asarray(rs.randn(1, sp, sp, skip_c) * 0.1, dt)
            vi = jax.jit(lyr.init)(rng, xi, sk)

            def f(v, y, lyr=lyr, sk=sk):
                out = lyr.apply(v, y, sk)
                s = jnp.mean(out.astype(jnp.float32))
                return (y + s.astype(dt)).astype(dt)
            slope(f"decoder_{3 - i} ({dim}@{sp}+skip)", f, vi, xi)


if __name__ == "__main__":
    main()
