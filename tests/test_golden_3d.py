"""GOLDEN parity tests against the REAL reference 3D code.

These import /root/reference/3D (d_lka_former) on CPU torch via
tests/reference_harness.py shims (D3D → F.grid_sample trilinear; monai →
minimal Convolution/UnetResBlock factories), build the actual
D_LKA_Former at random init, convert the state_dict with
deformablelka_tpu.convert.convert_dlka_former, and assert activation
parity in fp32. A failure here is a real converter or architecture bug
vs the published code.

Reference entry points exercised:
  D_LKA_Former                  3D/.../synapse/d_lka_former_synapse.py:8-167
  TransformerBlock_3D_single_deform_LKA  .../transformerblock.py:570-630
  deformable 3D sampling rule   3D/dcn/src/cuda/deform_im2col_cuda.cuh:192-265
    (shim re-expresses it with torch grid_sample; validated below
    against this repo's independent numpy loop reference)

The flagship block family ignores `input_size` (no pos-embed, no EPA
E/F projections — transformerblock.py:609-615), and
D_LKA_Former.forward only consumes img_size via proj_feat
(d_lka_former_synapse.py:139-156), so full-model golden parity can run
at a small crop (16, 32, 32) where CPU compile stays in budget.
"""

import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tests")
import reference_harness as rh  # noqa: E402
from references import deform_conv3d_ref  # noqa: E402

from deformablelka_tpu.convert.torch_loader import convert_dlka_former
from deformablelka_tpu.models.dlka_former import DLKAFormer


# ---------------------------------------------------------------------------
# Shim self-checks: grid_sample-based D3D vs the independent numpy loop
# ---------------------------------------------------------------------------

def test_shim_deform_conv3d_zero_offset_equals_conv():
    torch.manual_seed(0)
    for (cin, cout, g, dg, k, pad) in [(4, 4, 1, 1, 3, 1),
                                       (6, 4, 2, 3, 3, 1),
                                       (4, 4, 1, 2, 5, 2)]:
        x = torch.randn(2, cin, 7, 6, 5, dtype=torch.float64)
        w = torch.randn(cout, cin // g, k, k, k, dtype=torch.float64)
        b = torch.randn(cout, dtype=torch.float64)
        off = torch.zeros(2, dg * 3 * k ** 3, 7, 6, 5, dtype=torch.float64)
        y1 = rh._deform_conv3d(x, off, w, b, (1, 1, 1), (pad,) * 3,
                               (1, 1, 1), g, dg)
        y2 = torch.nn.functional.conv3d(x, w, b, 1, pad, 1, g)
        assert float((y1 - y2).abs().max()) < 1e-12


def test_shim_deform_conv3d_matches_numpy_reference():
    rng = np.random.RandomState(0)
    cin = cout = 4
    k, pad = 3, 1
    x = rng.randn(2, 6, 5, 7, cin)
    off = rng.randn(2, 6, 5, 7, 3 * k ** 3) * 2.0
    w = rng.randn(k, k, k, cin, cout)
    b = rng.randn(cout)
    ref = deform_conv3d_ref(x, off, w, b, 1, pad)
    y = rh._deform_conv3d(
        torch.tensor(x.transpose(0, 4, 1, 2, 3)),
        torch.tensor(off.transpose(0, 4, 1, 2, 3)),
        torch.tensor(w.transpose(4, 3, 0, 1, 2)),
        torch.tensor(b), (1, 1, 1), (pad,) * 3, (1, 1, 1), 1, 1)
    np.testing.assert_allclose(
        y.numpy().transpose(0, 2, 3, 4, 1), ref, atol=1e-12)


# ---------------------------------------------------------------------------
# Golden: full 3D flagship at a small crop
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_golden_3d_flagship_full_model_parity():
    depths = (2, 1, 1, 1)   # exercises stacked blocks in stage 0
    ref = rh.build_reference_3d_flagship(num_classes=4, seed=0,
                                         crop_size=(16, 32, 32),
                                         depths=depths)
    sd = rh.state_dict_numpy(ref)
    variables = convert_dlka_former(sd, depths=depths)

    x = np.random.RandomState(0).randn(1, 1, 16, 32, 32).astype(np.float32)
    with torch.no_grad():
        ys_t = [y.numpy() for y in ref(torch.tensor(x))]

    model = DLKAFormer(out_channels=4, img_size=(16, 32, 32),
                       depths=depths, do_ds=True)
    ys_j = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    assert len(ys_j) == len(ys_t) == 3
    for i, (yj, yt) in enumerate(zip(ys_j, ys_t)):
        a = np.asarray(yj).transpose(0, 4, 1, 2, 3)
        scale = max(np.abs(yt).max(), 1.0)
        assert a.shape == yt.shape
        assert np.abs(a - yt).max() < 2e-4 * scale, \
            f"head {i}: {np.abs(a - yt).max()} vs out scale {scale}"


# ---------------------------------------------------------------------------
# Golden: the full 14-variant 3D transformer block family
# ---------------------------------------------------------------------------

_VARIANTS = [
    "TransformerBlock",
    "TransformerBlock_EA",
    "TransformerBlock_3D_LKA",
    "TransformerBlock_2Dsingle",
    "TransformerBlock_3D_single_deform_LKA",
    "TransformerBlock_3D_LKA_3D_conv",
    "TransformerBlock_LKA_Spatial",
    "TransformerBlock_LKA_Channel",
    "TransformerBlock_LKA_Channel_norm",
    "TransformerBlock_SE",
    "TransformerBlock_Deform_LKA_Channel",
    "TransformerBlock_Deform_LKA_Channel_sequential",
    "TransformerBlock_Deform_LKA_Spatial",
    "TransformerBlock_Deform_LKA_Spatial_sequential",
]


@pytest.mark.parametrize("variant", _VARIANTS)
def test_golden_3d_block_variant(variant):
    """Per-variant activation parity vs the REAL reference block classes
    (transformerblock.py — the full --trans_block CLI axis,
    run_training.py:124-129), converted via
    convert_dlka_former(only_block=...). Catches both converter gaps and
    architecture drift in any of the 14 registered variants."""
    rh.install_all_3d()
    import torch as _t
    from d_lka_former.network_architecture.synapse import (
        transformerblock as T)
    from deformablelka_tpu.nn.transformer3d import TRANSFORMER_BLOCKS

    S = (4, 4, 4)
    N = S[0] * S[1] * S[2]
    C, proj, heads = 32, 32, 4
    _t.manual_seed(0)
    ref = getattr(T, variant)(input_size=N, hidden_size=C,
                              proj_size=proj, num_heads=heads,
                              dropout_rate=0.0, pos_embed=True).eval()
    # randomise pos_embed (zero-init would hide conversion bugs)
    with _t.no_grad():
        if ref.pos_embed is not None:
            ref.pos_embed.normal_(0, 0.02)

    sd = {f"blk.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}
    from deformablelka_tpu.convert.torch_loader import convert_dlka_former
    variables = convert_dlka_former(sd, only_block=("blk", "blk"))
    bvars = {"params": variables["params"]["blk"]}
    if variables["batch_stats"]:
        bvars["batch_stats"] = variables["batch_stats"]["blk"]

    x = np.random.RandomState(0).randn(2, C, *S).astype(np.float32)
    with torch.no_grad():
        y_t = ref(torch.tensor(x)).numpy()

    blk = TRANSFORMER_BLOCKS[variant](input_size=N, hidden_size=C,
                                      proj_size=proj, num_heads=heads,
                                      dropout_rate=0.0, pos_embed=True)
    y_j = blk.apply(bvars, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    y_j = np.asarray(y_j).transpose(0, 4, 1, 2, 3)
    scale = max(np.abs(y_t).max(), 1.0)
    assert y_j.shape == y_t.shape
    assert np.abs(y_j - y_t).max() < 2e-4 * scale, \
        f"{variant}: {np.abs(y_j - y_t).max()} vs {scale}"


# ---------------------------------------------------------------------------
# Golden: Generic nnU-Net (the baseline/cascade network)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_golden_generic_unet_parity():
    """Activation parity vs the real Generic_UNet
    (network_architecture/generic_UNet.py) at a 3-pool 3D config with
    deep supervision, convolutional pooling/upsampling, InstanceNorm +
    LeakyReLU(1e-2) — the Trainer_synapse.initialize_network recipe
    (:244-262)."""
    rh.install_all_3d()
    import torch as _t
    from torch import nn as tnn
    from d_lka_former.network_architecture.generic_UNet import Generic_UNet
    from d_lka_former.network_architecture.initialization import (
        InitWeights_He)

    pool = [[2, 2, 2]] * 3
    ks = [[3, 3, 3]] * 4
    _t.manual_seed(0)
    ref = Generic_UNet(
        1, 16, 3, len(pool), 2, 2, tnn.Conv3d, tnn.InstanceNorm3d,
        {"eps": 1e-5, "affine": True}, tnn.Dropout3d,
        {"p": 0, "inplace": True}, tnn.LeakyReLU,
        {"negative_slope": 1e-2, "inplace": True}, True, False,
        lambda x: x, InitWeights_He(1e-2), pool, ks, False, True,
        True).eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    from deformablelka_tpu.convert.torch_loader import convert_generic_unet
    from deformablelka_tpu.models.generic_unet import GenericUNet

    variables = convert_generic_unet(sd, num_pool=len(pool))
    x = np.random.RandomState(0).randn(1, 1, 32, 32, 32).astype(np.float32)
    with torch.no_grad():
        y_t = [t.numpy() for t in ref(torch.tensor(x))]

    model = GenericUNet(num_classes=3, base_num_features=16, num_pool=3,
                        pool_kernel_sizes=pool, conv_kernel_sizes=ks,
                        do_ds=True)
    y_j = model.apply(variables,
                      jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    assert len(y_j) == len(y_t)
    for i, (a, b) in enumerate(zip(y_j, y_t)):
        a = np.asarray(a).transpose(0, 4, 1, 2, 3)
        scale = max(np.abs(b).max(), 1.0)
        assert a.shape == b.shape
        assert np.abs(a - b).max() < 2e-4 * scale, \
            f"head {i}: {np.abs(a - b).max()} vs {scale}"


# ---------------------------------------------------------------------------
# Golden: pancreas VNet baseline
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_golden_vnet_parity():
    """Activation parity vs the real pancreas VNet
    (3D/pancreas_code/networks/vnet.py:144-246, batchnorm config),
    eval mode (dropout off)."""
    import importlib.util
    import torch as _t
    spec = importlib.util.spec_from_file_location(
        "pancreas_vnet",
        "/root/reference/3D/pancreas_code/networks/vnet.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _t.manual_seed(0)
    ref = mod.VNet(n_channels=1, n_classes=2, normalization="batchnorm",
                   has_dropout=True).eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    from deformablelka_tpu.convert.torch_loader import convert_vnet
    from deformablelka_tpu.models.pancreas_baselines import VNet

    variables = convert_vnet(sd, normalization="batchnorm")
    x = np.random.RandomState(0).randn(1, 1, 32, 32, 32).astype(np.float32)
    with torch.no_grad():
        y_t = ref(torch.tensor(x)).numpy()
    model = VNet(n_classes=2, normalization="batchnorm",
                 has_dropout=True, deterministic=True)
    y_j = np.asarray(model.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))).transpose(
        0, 4, 1, 2, 3)
    scale = max(np.abs(y_t).max(), 1.0)
    assert y_j.shape == y_t.shape
    assert np.abs(y_j - y_t).max() < 2e-4 * scale, \
        f"{np.abs(y_j - y_t).max()} vs {scale}"


def test_golden_resnet34_parity():
    """Activation parity vs the real pancreas Resnet34
    (3D/pancreas_code/networks/ResNet34.py:184-240: resnet34 3D encoder
    + normalization='none' deconv decoder), eval mode. Params AND BN
    running stats are randomised so the zero-gamma bn2 branches and the
    running-stat normalisation are actually exercised."""
    import importlib
    import importlib.util
    import torch as _t
    import torch.nn as _tnn

    # import under a unique package name: a plain "networks" import
    # collides with the reference 2D networks package loaded by the 2D
    # golden tests in the same pytest process
    pkg_name = "pancreas_networks"
    if pkg_name not in sys.modules:
        pkg_dir = "/root/reference/3D/pancreas_code/networks"
        spec = importlib.util.spec_from_file_location(
            pkg_name, f"{pkg_dir}/__init__.py",
            submodule_search_locations=[pkg_dir])
        pkg = importlib.util.module_from_spec(spec)
        sys.modules[pkg_name] = pkg
        spec.loader.exec_module(pkg)
    mod = importlib.import_module(f"{pkg_name}.ResNet34")
    _t.manual_seed(0)
    ref = mod.Resnet34(n_classes=2).eval()
    with _t.no_grad():
        g = _t.Generator().manual_seed(1)
        for p in ref.parameters():
            p.normal_(0.0, 0.05, generator=g)
        for m in ref.modules():
            if isinstance(m, _tnn.BatchNorm3d):
                m.running_mean.normal_(0.0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    from deformablelka_tpu.convert.torch_loader import convert_resnet34
    from deformablelka_tpu.models.pancreas_baselines import Resnet34Seg

    variables = convert_resnet34(sd)
    x = np.random.RandomState(0).randn(1, 1, 32, 32, 32).astype(np.float32)
    with torch.no_grad():
        y_t = ref(torch.tensor(x)).numpy()
    model = Resnet34Seg(n_classes=2)
    y_j = np.asarray(model.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))).transpose(
        0, 4, 1, 2, 3)
    scale = max(np.abs(y_t).max(), 1.0)
    assert y_j.shape == y_t.shape
    assert np.abs(y_j - y_t).max() < 2e-4 * scale, \
        f"{np.abs(y_j - y_t).max()} vs {scale}"


@pytest.mark.slow
def test_golden_acdc_full_model_parity():
    """Full-model activation parity for the ACDC D_LKA_Former variant
    (acdc/d_lka_former_acdc.py:8-125: stem patch (1,4,4), decoder2
    upsample (1,4,4)) vs our DLKAFormer with patch_size=(1,4,4)."""
    depths = (1, 1, 1, 1)
    crop = (8, 64, 64)
    ref = rh.build_reference_acdc(num_classes=4, seed=0, crop_size=crop,
                                  depths=depths)
    sd = rh.state_dict_numpy(ref)
    variables = convert_dlka_former(sd, depths=depths)

    x = np.random.RandomState(0).randn(1, 1, *crop).astype(np.float32)
    with torch.no_grad():
        ys_t = [y.numpy() for y in ref(torch.tensor(x))]

    model = DLKAFormer(
        out_channels=4, img_size=crop, patch_size=(1, 4, 4),
        depths=depths, do_ds=True,
        trans_block="TransformerBlock_3D_single_deform_LKA_acdc")
    ys_j = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    assert len(ys_j) == len(ys_t) == 3
    for i, (yj, yt) in enumerate(zip(ys_j, ys_t)):
        a = np.asarray(yj).transpose(0, 4, 1, 2, 3)
        scale = max(np.abs(yt).max(), 1.0)
        assert a.shape == yt.shape
        assert np.abs(a - yt).max() < 2e-4 * scale, \
            f"head {i}: {np.abs(a - yt).max()} vs {scale}"


@pytest.mark.slow
def test_golden_pancreas_dlka_net_parity():
    """Full-model activation parity for the pancreas D_LKA_Net
    (pancreas_code/networks/d_lka_former/d_lka_net_synapse.py:9-167,
    patch (2,2,2) per train_pancreas.py:109-117). Its unetr_pp-prefixed
    keys exercise the converter rename path (rename_layers.py:12-23)."""
    depths = (1, 1, 1, 1)
    crop = (32, 32, 32)
    ref = rh.build_reference_pancreas_net(num_classes=2, seed=0,
                                          crop_size=crop, depths=depths)
    sd = rh.state_dict_numpy(ref)
    variables = convert_dlka_former(sd, depths=depths)

    x = np.random.RandomState(0).randn(1, 1, *crop).astype(np.float32)
    with torch.no_grad():
        ys_t = ref(torch.tensor(x))
        ys_t = [y.numpy() for y in (ys_t if isinstance(ys_t, (list, tuple))
                                    else [ys_t])]

    model = DLKAFormer(out_channels=2, img_size=crop,
                       patch_size=(2, 2, 2), depths=depths, do_ds=True)
    ys_j = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    assert len(ys_j) == len(ys_t) == 3
    for i, (yj, yt) in enumerate(zip(ys_j, ys_t)):
        a = np.asarray(yj).transpose(0, 4, 1, 2, 3)
        scale = max(np.abs(yt).max(), 1.0)
        assert a.shape == yt.shape
        assert np.abs(a - yt).max() < 2e-4 * scale, \
            f"head {i}: {np.abs(a - yt).max()} vs {scale}"


# ---------------------------------------------------------------------------
# Golden: pancreas UNETR baseline (unetr.py:22-229 / MONAI 0.7)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_golden_unetr_parity():
    """Activation parity vs the reference's OWN unetr.py executed under
    the MONAI-0.7 shim (reference_harness.install_monai_unetr_shim):
    the Unetr*/UnetOut blocks inside come from the reference's vendored
    dynunet_block.py, the ViT from a name-faithful MONAI-0.7 re-typing.
    All params randomised (position embeddings are zero-init upstream,
    so left at copy) before conversion."""
    import importlib.util
    import torch as _t

    rh.install_monai_unetr_shim()
    spec = importlib.util.spec_from_file_location(
        "pancreas_unetr",
        "/root/reference/3D/pancreas_code/networks/unetr.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    _t.manual_seed(0)
    ref = mod.UNETR(in_channels=1, out_channels=2, img_size=(32, 32, 32),
                    feature_size=8, hidden_size=48, mlp_dim=96,
                    num_heads=4, pos_embed="perceptron",
                    norm_name="instance", conv_block=False,
                    res_block=True, dropout_rate=0.0).eval()
    with _t.no_grad():
        g = _t.Generator().manual_seed(1)
        for p in ref.parameters():
            p.normal_(0.0, 0.05, generator=g)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    from deformablelka_tpu.convert.torch_loader import convert_unetr
    from deformablelka_tpu.models.pancreas_baselines import UNETR

    variables = convert_unetr(sd)
    x = np.random.RandomState(0).randn(1, 1, 32, 32, 32).astype(
        np.float32)
    with torch.no_grad():
        y_t = ref(torch.tensor(x)).numpy()
    model = UNETR(n_classes=2, in_channels=1, img_size=(32, 32, 32),
                  feature_size=8, hidden=48, mlp_dim=96, heads=4)
    y_j = np.asarray(model.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))).transpose(
        0, 4, 1, 2, 3)
    scale = max(np.abs(y_t).max(), 1.0)
    assert y_j.shape == y_t.shape
    assert np.abs(y_j - y_t).max() < 2e-4 * scale, \
        f"{np.abs(y_j - y_t).max()} vs {scale}"
