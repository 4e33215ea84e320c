"""Round-4: dissect the stage-1 flagship block (16³, C=64) — the r3
stage table says the full block is 3.08 ms × 6 blocks = 18.5 ms of the
~64.5 ms forward, yet its DeformConvPack is only 0.37 ms (v4w). Where
do the other ~2.7 ms live? Candidates: the dw7³d3 whose dilated extent
(19) exceeds the 16-voxel dims, the UnetResBlock (two 3³ C64 convs +
batch norm), the 1×1 projections, or token-side LayerNorm/reshapes.

In-program chained-slope method (PERF.md "in-program slope method") so
XLA fusion behavior matches the real model. Also re-runs stage-0
(32³ C32) for a same-session anchor.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N1, N2, REPS = 2, 6, 5


def slope(name, f, v, x):
    ts = {}
    for n in (N1, N2):
        def chain(v, x, n=n):
            y = x
            for _ in range(n):
                y = f(v, y).astype(x.dtype).reshape(x.shape)
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


def dissect(sp, dim, tag):
    import deformablelka_tpu.nn.blocks3d as B3
    from deformablelka_tpu.nn.layers import Conv3d
    from deformablelka_tpu.nn.dynunet import UnetResBlock
    from deformablelka_tpu.nn.transformer3d import TRANSFORMER_BLOCKS
    from deformablelka_tpu.nn.norms import LayerNorm

    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, *sp, dim) * 0.1, dt)
    N = sp[0] * sp[1] * sp[2]
    print(f"[{tag}] {sp} C={dim}", flush=True)

    # full block
    Blk = TRANSFORMER_BLOCKS["TransformerBlock_3D_single_deform_LKA"]
    blk = Blk(input_size=N, hidden_size=dim, proj_size=64)
    v = jax.jit(blk.init)(rng, x)
    slope("full block", lambda v, y: blk.apply(v, y), v, x)

    # pieces
    class P(nn.Module):
        which: str

        @nn.compact
        def __call__(self, y):
            w = self.which
            if w == "dw5":
                return Conv3d(dim, 5, padding=2, groups=dim,
                              name="c")(y)
            if w == "dw7d3":
                return Conv3d(dim, 7, padding=9, groups=dim,
                              dilation=3, name="c")(y)
            if w == "dwpair":
                return B3._dw_pair3d(y, dim)
            if w == "deform":
                return B3.DeformConvPack3d(name="d")(y)
            if w == "proj1x1":
                return Conv3d(dim, 1, name="c")(y)
            if w == "resblock":
                return UnetResBlock(3, dim, kernel_size=3, stride=1,
                                    norm_name="batch", name="r")(y)
            if w == "lnorm":
                t = y.reshape(y.shape[0], -1, dim)
                t = LayerNorm(name="n")(t)
                return t.reshape(y.shape)
            if w == "gate":
                return B3.LKA3dDeform(name="g")(y)
            raise ValueError(w)

    for which in ("dw5", "dw7d3", "dwpair", "deform", "proj1x1",
                  "resblock", "lnorm", "gate"):
        m = P(which=which)
        v = jax.jit(m.init)(rng, x)
        slope(which, lambda v, y, m=m: m.apply(v, y), v, x)


def main():
    dissect((16, 16, 16), 64, "stage1")
    dissect((32, 32, 32), 32, "stage0")


if __name__ == "__main__":
    main()
