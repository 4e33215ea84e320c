"""Per-component TPU timings for the 3D flagship forward at the
Synapse tile (64x128x128): where do the milliseconds go now?"""
import os, sys, time

sys.path.insert(0, "/root/repo")

import numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench(name, fn, *args, reps=5):
    # NOTE: on the tunneled axon backend block_until_ready is a no-op;
    # only a host fetch synchronises — reduce to a scalar and fetch it.
    f = jax.jit(lambda *a: jax.tree.reduce(
        lambda acc, t: acc + jnp.sum(t.astype(jnp.float32)), fn(*a), 0.0))
    np.asarray(f(*args))
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    np.asarray(out)
    print(f"{name}: {(time.time()-t0)/reps*1000:.0f} ms", flush=True)


def main():
    from deformablelka_tpu.nn.dynunet import UnetResBlock
    from deformablelka_tpu.nn.transformer3d import TRANSFORMER_BLOCKS
    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    # full-res UnetResBlock (encoder1): 1->16 @ 64x128x128
    x = jnp.zeros((1, 64, 128, 128, 1), dt)
    blk = UnetResBlock(3, 16, kernel_size=3, stride=1, norm_name="batch")
    v = jax.jit(blk.init)(rng, x)
    bench("encoder1 UnetResBlock 1->16 @64x128x128",
          lambda v, x: blk.apply(v, x, mutable=[]), v, x)

    # stage1 transformer block: 32ch @ 32x64x64... flagship dims
    Block = TRANSFORMER_BLOCKS["TransformerBlock_3D_single_deform_LKA"]
    for dim, sp in [(32, (32, 64, 64)), (64, (16, 32, 32)),
                    (128, (8, 16, 16)), (256, (4, 8, 8))]:
        xx = jnp.zeros((1, *sp, dim), dt)
        b = Block(hidden_size=dim, proj_size=64, num_heads=4,
                  input_size=int(np.prod(sp)))
        vv = jax.jit(b.init)(rng, xx)
        bench(f"deform_LKA block {dim}ch @{sp}",
              lambda vv, xx: b.apply(vv, xx, mutable=[]), vv, xx)


if __name__ == "__main__":
    main()
