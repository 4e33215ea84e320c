"""MViT-LKA, DAE-LKA, TransUNet, HiFormer shape + semantics tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.slow
def test_mvit_lka_shapes():
    from deformablelka_tpu.models.mvit import MViTLKAFormer
    m = MViTLKAFormer(num_classes=9, img_size=224, embed_dim=16,
                      depth=4, last_block_indexes=(0, 1, 2, 3))
    x = jnp.zeros((1, 224, 224, 1))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (1, 224, 224, 9)


def test_mvit_window_roundtrip_and_relpos():
    from deformablelka_tpu.models.mvit import (
        window_partition, window_unpartition, _rel_pos_select)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 13, 11, 4))
    w, pad = window_partition(x, 7)
    assert w.shape == (2 * 2 * 2, 7, 7, 4)
    back = window_unpartition(w, 7, pad, (13, 11))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # q=14 vs k=28 indexes the full 2*28-1 table
    table = jnp.arange(55, dtype=jnp.float32)[:, None]
    sel = _rel_pos_select(14, 28, table)
    assert sel.shape == (14, 28, 1)
    # matching sizes degrade to the usual (q - k + k - 1) indexing
    sel2 = np.asarray(_rel_pos_select(4, 4, jnp.arange(7.0)[:, None]))
    assert sel2[0, 3, 0] == 0 and sel2[3, 0, 0] == 6


def test_mvit_backbone_param_count_full():
    """MViTv2-S 4-out backbone lands in the published ~45M range."""
    from deformablelka_tpu.models.mvit import MViT4Out
    m = MViT4Out(img_size=224)
    shapes = jax.eval_shape(
        lambda k: m.init(k, jnp.zeros((1, 224, 224, 3))),
        jax.random.PRNGKey(0))
    n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))
    assert 35e6 < n < 55e6


@pytest.mark.slow
def test_dae_lka_shapes():
    from deformablelka_tpu.models.dae_lka import DAELKAFormer
    m = DAELKAFormer(num_classes=9, dims=(32, 80, 128), layers=(1, 1, 1))
    x = jnp.zeros((1, 224, 224, 1))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (1, 224, 224, 9)


@pytest.mark.slow
def test_transunet_shapes_and_sigmoid():
    from deformablelka_tpu.models.transunet import TransUNet
    m = TransUNet(num_classes=1, img_size=224, hidden=32, num_layers=2,
                  heads=4, mlp_dim=64, block_units=(1, 1, 1))
    x = jnp.zeros((1, 224, 224, 1))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 224, 224, 1)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_upsample_align_corners_matches_torch():
    torch = pytest.importorskip("torch")
    from deformablelka_tpu.models.transunet import upsample_bilinear2x
    xn = np.random.RandomState(0).randn(2, 7, 9, 3).astype(np.float32)
    ours = np.asarray(upsample_bilinear2x(jnp.asarray(xn)))
    theirs = torch.nn.UpsamplingBilinear2d(scale_factor=2)(
        torch.from_numpy(xn).permute(0, 3, 1, 2)
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.slow
def test_transunet_resnet_skip_grid():
    """Skips land on the exact /2, /4, /8 grids (zero-pad fix)."""
    from deformablelka_tpu.models.transunet import ResNetV2
    m = ResNetV2(block_units=(1, 1, 1))
    x = jnp.zeros((1, 224, 224, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    feat, skips = m.apply(v, x)
    assert feat.shape == (1, 14, 14, 1024)
    assert [s.shape[1] for s in skips] == [28, 56, 112]
    assert [s.shape[-1] for s in skips] == [512, 256, 64]


@pytest.mark.slow
def test_hiformer_shapes():
    from deformablelka_tpu.models.hiformer import HiFormer
    m = HiFormer(num_classes=1, img_size=224, swin_dims=(16, 32, 64),
                 cnn_dims=(8, 16, 32), cnn_blocks=(1, 1, 1),
                 swin_depths=(1, 1, 1), swin_heads=(2, 2, 4),
                 dlf_heads=(2, 2))
    x = jnp.zeros((1, 224, 224, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (1, 224, 224, 1)


def test_hiformer_cross_attention_returns_cls():
    from deformablelka_tpu.models.hiformer import CrossAttentionBlock
    m = CrossAttentionBlock(dim=16, num_heads=2)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 10, 16),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (2, 1, 16)


def test_stvit_unfold_and_amaxpool_match_torch():
    torch = pytest.importorskip("torch")
    from deformablelka_tpu.models.stvit import (
        extract_patches, adaptive_max_pool)
    xn = np.random.RandomState(0).randn(2, 14, 14, 5).astype(np.float32)
    ours = np.asarray(extract_patches(jnp.asarray(xn), 14, 7, 3, 4))
    xt = torch.from_numpy(xn).permute(0, 3, 1, 2)
    xt = torch.nn.functional.pad(xt, (3, 4, 3, 4))
    un = torch.nn.functional.unfold(xt, kernel_size=14, stride=7)
    un = un.view(2, 5, 14, 14, -1).permute(0, 4, 2, 3, 1)
    un = un.reshape(2, -1, 196, 5).numpy()
    np.testing.assert_allclose(ours, un, atol=0)
    p_ours = np.asarray(adaptive_max_pool(jnp.asarray(xn), 3))
    p_torch = torch.nn.functional.adaptive_max_pool2d(
        torch.from_numpy(xn).permute(0, 3, 1, 2), (3, 3)
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(p_ours, p_torch, atol=0)


@pytest.mark.slow
def test_stvit_lka_shapes():
    from deformablelka_tpu.models.stvit import STVitLKA
    m = STVitLKA(num_classes=9, embed_dim=16, depths=(1, 1, 6, 1),
                 num_heads=(2, 2, 2, 2))
    x = jnp.zeros((1, 224, 224, 1))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (1, 224, 224, 9)


def test_semantic_stvit_shapes():
    from deformablelka_tpu.models.stvit import SemanticSTViT
    # depths trimmed from (1,1,6,1,6,1,1): the two 6-deep DeiT
    # stages dominated the fast suite (49.5 s); one block per stage
    # exercises the same shape plumbing (suite-trim round 5)
    m = SemanticSTViT(num_classes=4, embed_dim=16,
                      depths=(1, 1, 2, 1, 2, 1, 1),
                      num_heads=(2, 2, 2, 2, 2, 2, 2))
    x = jnp.zeros((1, 224, 224, 1))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (1, 224, 224, 4)


@pytest.mark.slow
def test_bidaeformer_shapes():
    from deformablelka_tpu.models.biformer import BiDAEFormer
    m = BiDAEFormer(num_classes=9, dims=(32, 64, 128), depths=(1, 2, 1))
    x = jnp.zeros((1, 224, 224, 1))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (1, 224, 224, 9)


def test_bra_routing_selects_windows():
    """topk == all windows -> routing attention == attending to the full
    map (order-invariant by softmax); check output is finite and the
    gather indexes valid windows."""
    from deformablelka_tpu.models.biformer import BiLevelRoutingAttention
    att = BiLevelRoutingAttention(dim=16, num_heads=2, n_win=4, topk=16)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 16),
                    jnp.float32)
    v = att.init(jax.random.PRNGKey(1), x)
    out = att.apply(v, x)
    assert out.shape == (2, 16, 16, 16)
    assert bool(jnp.isfinite(out).all())


def test_registry_builds_all_models():
    from deformablelka_tpu.models.registry import MODELS_2D, build_model_2d
    assert len(MODELS_2D) == 13
    for name in MODELS_2D:
        m = build_model_2d(name, num_classes=9, img_size=224)
        assert m is not None
    with pytest.raises(ValueError):
        build_model_2d("nope")


def test_s2d_conv_matches_lax():
    from deformablelka_tpu.ops.convs import _conv3d_s2d
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 8, 12, 10, 5), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 3, 5, 7), jnp.float32)
    b = jnp.asarray(rs.randn(7), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
    got = _conv3d_s2d(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4)


def test_zdecomp_dilated_depthwise_matches_lax():
    from deformablelka_tpu.ops.convs import (
        _depthwise3d_zdecomp, conv3d, same_padding)
    rs = np.random.RandomState(0)
    for shape, k, d in [((2, 10, 11, 13, 6), 7, 3), ((1, 9, 9, 9, 4), 5, 2)]:
        x = jnp.asarray(rs.randn(*shape), jnp.float32)
        w = jnp.asarray(rs.randn(k, k, k, 1, shape[-1]), jnp.float32)
        b = jnp.asarray(rs.randn(shape[-1]), jnp.float32)
        pad = same_padding((k, k, k), (1, 1, 1), (d, d, d), ndim=3)
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), pad, rhs_dilation=(d, d, d),
            feature_group_count=shape[-1],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
        got = _depthwise3d_zdecomp(x, w, d, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)
        # through the conv3d dispatcher (the model call-site path)
        got2 = conv3d(x, w, padding=d * (k // 2), dilation=d,
                      groups=shape[-1], bias=b)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                                   atol=1e-4)


def test_lka_spatial_attention_golden_vs_torch():
    """Module-level golden activation parity (SURVEY §4 item 2): the core
    LKA gate (2D/deformable_LKA/LKA.py:4-37) retyped in torch with random
    weights vs our flax SpatialAttention with the same weights."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    from deformablelka_tpu.nn.lka2d import SpatialAttention

    dim = 12

    class TorchLKA(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv0 = tnn.Conv2d(dim, dim, 5, padding=2, groups=dim)
            self.conv_spatial = tnn.Conv2d(dim, dim, 7, stride=1,
                                           padding=9, groups=dim,
                                           dilation=3)
            self.conv1 = tnn.Conv2d(dim, dim, 1)

        def forward(self, x):
            u = x.clone()
            a = self.conv1(self.conv_spatial(self.conv0(x)))
            return u * a

    class TorchSpatial(tnn.Module):
        def __init__(self):
            super().__init__()
            self.proj_1 = tnn.Conv2d(dim, dim, 1)
            self.activation = tnn.GELU()
            self.spatial_gating_unit = TorchLKA()
            self.proj_2 = tnn.Conv2d(dim, dim, 1)

        def forward(self, x):
            s = x.clone()
            x = self.spatial_gating_unit(self.activation(self.proj_1(x)))
            return self.proj_2(x) + s

    tm = TorchSpatial().eval()
    xn = np.random.RandomState(0).randn(2, dim, 17, 19).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(xn)).numpy()

    def cw(conv):  # torch (O,I/g,kh,kw) -> ours (kh,kw,I/g,O)
        return jnp.asarray(conv.weight.detach().numpy()
                           .transpose(2, 3, 1, 0))

    def cb(conv):
        return jnp.asarray(conv.bias.detach().numpy())

    params = {
        "proj_1": {"weight": cw(tm.proj_1), "bias": cb(tm.proj_1)},
        "proj_2": {"weight": cw(tm.proj_2), "bias": cb(tm.proj_2)},
        "spatial_gating_unit": {
            "conv0": {"weight": cw(tm.spatial_gating_unit.conv0),
                      "bias": cb(tm.spatial_gating_unit.conv0)},
            "conv_spatial": {
                "weight": cw(tm.spatial_gating_unit.conv_spatial),
                "bias": cb(tm.spatial_gating_unit.conv_spatial)},
            "conv1": {"weight": cw(tm.spatial_gating_unit.conv1),
                      "bias": cb(tm.spatial_gating_unit.conv1)},
        },
    }
    ours = SpatialAttention().apply(
        {"params": params}, jnp.asarray(xn.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               ref, atol=2e-4)
