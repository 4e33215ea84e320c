"""Parity vs PyTorch BUILTINS (CPU) for the primitive layers — conv
padding semantics, transposed conv, norms, GELU. These lock down the
weight-converter layout contracts (convert/torch_loader.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from deformablelka_tpu.ops.convs import (  # noqa: E402
    conv2d, conv3d, conv_transpose, same_padding)


RNG = np.random.RandomState(0)


def _t(x):
    return torch.from_numpy(np.asarray(x))


@pytest.mark.parametrize("k,s,d,p", [(3, 1, 1, 1), (5, 1, 1, 2),
                                     (7, 1, 3, 9), (3, 2, 1, 1),
                                     (2, 2, 1, 0), (1, 1, 1, 0)])
def test_conv2d_vs_torch(k, s, d, p):
    B, H, W, Ci, Co = 2, 12, 12, 3, 5
    x = RNG.randn(B, H, W, Ci).astype(np.float32)
    w = (RNG.randn(k, k, Ci, Co) * 0.2).astype(np.float32)
    b = RNG.randn(Co).astype(np.float32)
    got = conv2d(jnp.array(x), jnp.array(w), stride=s, padding=p,
                 dilation=d, bias=jnp.array(b))
    # torch weight layout (Co, Ci, kh, kw)
    wt = _t(w.transpose(3, 2, 0, 1))
    ref = torch.nn.functional.conv2d(
        _t(x.transpose(0, 3, 1, 2)), wt, _t(b), stride=s, padding=p,
        dilation=d).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_depthwise_conv2d_vs_torch():
    B, H, W, C = 1, 10, 10, 4
    x = RNG.randn(B, H, W, C).astype(np.float32)
    w = (RNG.randn(5, 5, 1, C) * 0.2).astype(np.float32)
    got = conv2d(jnp.array(x), jnp.array(w), padding=2, groups=C)
    wt = _t(w.transpose(3, 2, 0, 1))  # (C,1,5,5)
    ref = torch.nn.functional.conv2d(
        _t(x.transpose(0, 3, 1, 2)), wt, None, padding=2,
        groups=C).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("k,s,d,p", [(3, 1, 1, 1), (5, 1, 1, 2),
                                     (7, 1, 3, 9)])
def test_conv3d_vs_torch(k, s, d, p):
    B, D, H, W, Ci, Co = 1, 8, 8, 8, 2, 3
    x = RNG.randn(B, D, H, W, Ci).astype(np.float32)
    w = (RNG.randn(k, k, k, Ci, Co) * 0.2).astype(np.float32)
    got = conv3d(jnp.array(x), jnp.array(w), stride=s, padding=p, dilation=d)
    wt = _t(w.transpose(4, 3, 0, 1, 2))
    ref = torch.nn.functional.conv3d(
        _t(x.transpose(0, 4, 1, 2, 3)), wt, None, stride=s, padding=p,
        dilation=d).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("k,s", [(2, 2), (4, 4), ((2, 4, 4), (2, 4, 4))])
def test_conv_transpose3d_vs_torch(k, s):
    B, D, H, W, Ci, Co = 1, 3, 4, 4, 4, 2
    kt = k if isinstance(k, tuple) else (k, k, k)
    st = s if isinstance(s, tuple) else (s, s, s)
    pad = tuple((kk - ss + 1) // 2 for kk, ss in zip(kt, st))
    opad = tuple(2 * pp + ss - kk for pp, ss, kk in zip(pad, st, kt))
    x = RNG.randn(B, D, H, W, Ci).astype(np.float32)
    w = (RNG.randn(*kt, Ci, Co) * 0.2).astype(np.float32)
    got = conv_transpose(jnp.array(x), jnp.array(w), stride=st)
    wt = _t(w.transpose(3, 4, 0, 1, 2))  # (Ci, Co, kd, kh, kw)
    ref = torch.nn.functional.conv_transpose3d(
        _t(x.transpose(0, 4, 1, 2, 3)), wt, None, stride=st, padding=pad,
        output_padding=opad).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_layernorm_vs_torch():
    from deformablelka_tpu.nn.norms import LayerNorm
    import jax
    x = RNG.randn(2, 7, 9, 16).astype(np.float32)
    ln = LayerNorm(eps=1e-6)
    variables = ln.init(jax.random.PRNGKey(0), jnp.array(x))
    scale = RNG.randn(16).astype(np.float32)
    bias = RNG.randn(16).astype(np.float32)
    variables = {"params": {"scale": jnp.array(scale),
                            "bias": jnp.array(bias)}}
    got = ln.apply(variables, jnp.array(x))
    tln = torch.nn.LayerNorm(16, eps=1e-6)
    tln.weight.data = _t(scale)
    tln.bias.data = _t(bias)
    ref = tln(_t(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_instancenorm_vs_torch():
    from deformablelka_tpu.nn.norms import InstanceNorm
    import jax
    x = RNG.randn(2, 5, 6, 7, 8).astype(np.float32)  # (B,D,H,W,C)
    norm = InstanceNorm()
    scale = RNG.randn(8).astype(np.float32)
    bias = RNG.randn(8).astype(np.float32)
    variables = {"params": {"scale": jnp.array(scale),
                            "bias": jnp.array(bias)}}
    got = norm.apply(variables, jnp.array(x))
    tn = torch.nn.InstanceNorm3d(8, affine=True)
    tn.weight.data = _t(scale)
    tn.bias.data = _t(bias)
    ref = tn(_t(x.transpose(0, 4, 1, 2, 3))).detach().numpy()
    ref = ref.transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_batchnorm_eval_vs_torch():
    from deformablelka_tpu.nn.norms import BatchNorm
    x = RNG.randn(2, 6, 6, 5).astype(np.float32)
    scale = RNG.rand(5).astype(np.float32) + 0.5
    bias = RNG.randn(5).astype(np.float32)
    mean = RNG.randn(5).astype(np.float32)
    var = RNG.rand(5).astype(np.float32) + 0.5
    bn = BatchNorm()
    variables = {"params": {"scale": jnp.array(scale),
                            "bias": jnp.array(bias)},
                 "batch_stats": {"mean": jnp.array(mean),
                                 "var": jnp.array(var)}}
    got = bn.apply(variables, jnp.array(x))
    tbn = torch.nn.BatchNorm2d(5)
    tbn.weight.data = _t(scale)
    tbn.bias.data = _t(bias)
    tbn.running_mean.data = _t(mean)
    tbn.running_var.data = _t(var)
    tbn.eval()
    ref = tbn(_t(x.transpose(0, 3, 1, 2))).detach().numpy().transpose(
        0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_gelu_vs_torch():
    from deformablelka_tpu.nn.layers import gelu
    x = RNG.randn(100).astype(np.float32)
    got = np.asarray(gelu(jnp.array(x)))
    ref = torch.nn.functional.gelu(_t(x)).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_pixelshuffle_patchexpand_vs_torch_rearrange():
    """PatchExpand's 2×2 shuffle must equal einops 'b h w (p1 p2 c) ->
    b (h p1) (w p2) c' used at MaxViT_deform_LKA.py:509."""
    import einops
    B, H, W, C = 1, 3, 4, 8
    x = RNG.randn(B, H, W, C).astype(np.float32)
    mine = x.reshape(B, H, W, 2, 2, C // 4)
    mine = mine.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, C // 4)
    ref = einops.rearrange(_t(x), "b h w (p1 p2 c) -> b (h p1) (w p2) c",
                           p1=2, p2=2, c=C // 4).numpy()
    np.testing.assert_array_equal(mine, ref)
