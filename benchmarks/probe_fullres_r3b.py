"""Round-3 full-res attack probe. Interleaved A/B (2 passes to expose
tunnel-throttle drift) of:
  1. UnetResBlock.apply vs an identical hand-built block (the earlier
     probe showed 6.4 vs 4.1 ms — same graph, so either throttle drift
     or a real dispatch difference; interleaving decides).
  2. ConvTranspose (2,4,4)/2x: lhs-dilated lax path vs the new
     _conv_transpose_d2s matmul+depth-to-space path.
  3. InstanceNorm f32-apply (current) vs bf16-apply candidate.
  4. Whole-block-in-s2d-space candidate: both convs in s2d form with
     the norm computed over (spatial, s2d-phase) per channel — elides
     the two inter-conv relayouts.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N1, N2, REPS = 2, 6, 8


def make_slope(name, f, *args):
    fjs = {}
    for n in (N1, N2):
        def chain(*a, n=n):
            y = a[-1]
            for _ in range(n):
                y = f(*a[:-1], y)
            return jnp.sum(y.astype(jnp.float32))
        fjs[n] = jax.jit(chain)
        np.asarray(fjs[n](*args))  # warm

    def run():
        ts = {}
        for n in (N1, N2):
            t0 = time.time()
            for _ in range(REPS):
                out = fjs[n](*args)
            np.asarray(out)
            ts[n] = (time.time() - t0) / REPS * 1000
        per = (ts[N2] - ts[N1]) / (N2 - N1)
        print(f"  {name}: {per:.3f} ms", flush=True)
        return per
    return run


def main():
    import flax.linen as nn
    from deformablelka_tpu.nn.dynunet import UnetResBlock
    from deformablelka_tpu.nn.layers import Conv3d, ConvTranspose
    from deformablelka_tpu.nn.norms import InstanceNorm
    from deformablelka_tpu.ops import convs as C

    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    rs = np.random.RandomState(0)
    x16 = jnp.asarray(rs.randn(1, 64, 128, 128, 16) * 0.1, dt)

    runs = []

    # 1. UnetResBlock vs hand block
    ur = UnetResBlock(3, 16, kernel_size=3, stride=1, norm_name="instance")
    v_ur = jax.jit(ur.init)(rng, x16)
    runs.append(make_slope("UnetResBlock C16 full-res",
                           lambda v, y: ur.apply(v, y), v_ur, x16))

    class WithIN(nn.Module):
        @nn.compact
        def __call__(self, y):
            out = Conv3d(16, 3, use_bias=False, name="c1")(y)
            out = InstanceNorm(affine=False, name="n1")(out)
            out = nn.leaky_relu(out, 0.01)
            out = Conv3d(16, 3, use_bias=False, name="c2")(out)
            out = InstanceNorm(affine=False, name="n2")(out)
            return nn.leaky_relu(out + y, 0.01)
    m_h = WithIN()
    v_h = jax.jit(m_h.init)(rng, x16)
    runs.append(make_slope("hand WithIN block",
                           lambda v, y: m_h.apply(v, y), v_h, x16))

    # 2. transposes: lax vs d2s
    x32c = jnp.asarray(rs.randn(1, 32, 32, 32, 32) * 0.1, dt)
    w244 = jnp.asarray(rs.randn(2, 4, 4, 32, 16) * 0.05, dt)

    def t_lax(w, y):
        ks, st = (2, 4, 4), (2, 4, 4)
        pad_cfg = [(k - 1, k - 1) for k in ks]
        wf = jnp.flip(w, axis=(0, 1, 2))
        out = lax.conv_general_dilated(
            y, wf, (1, 1, 1), pad_cfg, lhs_dilation=st,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        s = jnp.mean(out.astype(jnp.float32)).astype(y.dtype)
        return y + s

    def t_d2s(w, y):
        out = C._conv_transpose_d2s(y, w, (2, 4, 4), None)
        s = jnp.mean(out.astype(jnp.float32)).astype(y.dtype)
        return y + s
    runs.append(make_slope("transpose (2,4,4) lax", t_lax, w244, x32c))
    runs.append(make_slope("transpose (2,4,4) d2s", t_d2s, w244, x32c))

    x16c = jnp.asarray(rs.randn(1, 16, 16, 16, 64) * 0.1, dt)
    w2 = jnp.asarray(rs.randn(2, 2, 2, 64, 32) * 0.05, dt)

    def t2_lax(w, y):
        pad_cfg = [(1, 1)] * 3
        wf = jnp.flip(w, axis=(0, 1, 2))
        out = lax.conv_general_dilated(
            y, wf, (1, 1, 1), pad_cfg, lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        s = jnp.mean(out.astype(jnp.float32)).astype(y.dtype)
        return y + s

    def t2_d2s(w, y):
        out = C._conv_transpose_d2s(y, w, (2, 2, 2), None)
        s = jnp.mean(out.astype(jnp.float32)).astype(y.dtype)
        return y + s
    runs.append(make_slope("transpose 2x 16^3 C64->32 lax", t2_lax, w2, x16c))
    runs.append(make_slope("transpose 2x 16^3 C64->32 d2s", t2_d2s, w2, x16c))

    # 3. instance-norm apply dtype
    def in_f32(y):
        xf = y.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 3), keepdims=True)
        return ((xf - mean) / jnp.sqrt(var + 1e-5)).astype(y.dtype)

    def in_bf16(y):
        xf = y.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 3), keepdims=True)
        inv = lax.rsqrt(var + 1e-5)
        return (y - mean.astype(y.dtype)) * inv.astype(y.dtype)
    runs.append(make_slope("IN f32-apply", lambda _, y: in_f32(y) + y,
                           None, x16))
    runs.append(make_slope("IN bf16-apply", lambda _, y: in_bf16(y) + y,
                           None, x16))

    # 4. whole-block-in-s2d candidate (norm over (spatial, phase))
    w1 = jnp.asarray(rs.randn(3, 3, 3, 16, 16) * 0.05, dt)
    w2b = jnp.asarray(rs.randn(3, 3, 3, 16, 16) * 0.05, dt)

    def s2d_w(w):
        # same one-hot einsum as _conv3d_s2d
        A = np.zeros((3, 2, 3, 2), np.float32)
        for k in range(3):
            for d in range(2):
                t = d + k - 1
                A[k, d, (t >> 1) + 1, t & 1] = 1
        Aj = jnp.asarray(A, w.dtype)
        C_, Co = w.shape[3], w.shape[4]
        W2 = jnp.einsum("zyxco,zaqe,ybrf,xdsg->qrsefgcabdo", w, Aj, Aj, Aj)
        return W2.reshape(3, 3, 3, 8 * C_, 8 * Co)

    def block_s2d(ws, y):
        wa, wb = ws
        B, D, H, W, Ch = y.shape
        X = y.reshape(B, D // 2, 2, H // 2, 2, W // 2, 2, Ch)
        X = X.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            B, D // 2, H // 2, W // 2, 8 * Ch)

        def conv(X, w):
            return lax.conv_general_dilated(
                X, s2d_w(w), (1, 1, 1), ((1, 1),) * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        def norm(X):
            xf = X.astype(jnp.float32).reshape(*X.shape[:-1], 8, Ch)
            mean = jnp.mean(xf, axis=(1, 2, 3, 4), keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 3, 4),
                           keepdims=True)
            out = (xf - mean) / jnp.sqrt(var + 1e-5)
            return out.reshape(X.shape).astype(X.dtype)

        out = nn.leaky_relu(norm(conv(X, wa)), 0.01)
        out = norm(conv(out, wb))
        out = nn.leaky_relu(out + X, 0.01)
        o = out.reshape(B, D // 2, H // 2, W // 2, 2, 2, 2, Ch)
        o = o.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        return o.reshape(B, D, H, W, Ch)
    runs.append(make_slope("block fully-in-s2d", block_s2d,
                           (w1, w2b), x16))

    for pas in range(2):
        print(f"pass {pas}:", flush=True)
        for r in runs:
            r()


if __name__ == "__main__":
    main()
