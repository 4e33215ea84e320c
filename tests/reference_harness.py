"""Import the REAL reference code (/root/reference) for golden parity tests.

The reference 2D networks import `timm` (only a vendored subset ships at
networks/merit_lib/models_timm) and `torchvision` (absent in this image).
This module installs:

  * a `timm` shim whose `timm.models.layers` IS the reference's own
    vendored `networks.merit_lib.models_timm.layers` package (no
    re-implementation — we alias the reference code);
  * a `torchvision` shim providing `torchvision.ops.DeformConv2d` /
    `deform_conv2d` built on `torch.nn.functional.grid_sample`, torch's
    canonical bilinear sampler, so the deformable sampling semantics in
    the golden tests come from PyTorch itself, not from this repo.
    (torchvision deform_conv2d: offsets (B, 2*kh*kw*groups_off, H, W)
    ordered (dy, dx) per tap, taps row-major; sample point =
    p0 - pad + k*dilation + dp; bilinear, zeros outside. Verified
    against torchvision docs and the D3D CUDA kernel's 2D analog,
    /root/reference/3D/dcn/src/cuda/deform_im2col_cuda.cuh:26-72.)

Also patches `torch.load` during reference-model construction so
`MaxViT4Out_Small.__init__` (merit_lib/networks.py:239-252), which
unconditionally loads an ImageNet .pth, falls back to random init
(`load_state_dict(..., strict=False)` with an empty dict is a no-op).
"""

import contextlib
import os
import sys
import types

import numpy as np
import torch
import torch.nn.functional as F

REF2D = "/root/reference/2D"
REF3D = "/root/reference/3D"


# ---------------------------------------------------------------------------
# torchvision shim: deform_conv2d on top of F.grid_sample
# ---------------------------------------------------------------------------

def _deform_conv2d(x, offset, weight, bias=None, stride=(1, 1),
                   padding=(0, 0), dilation=(1, 1), mask=None):
    """torchvision.ops.deform_conv2d semantics via F.grid_sample.

    x:      (B, Cin, H, W)
    offset: (B, off_groups*2*kh*kw, Hout, Wout), (dy, dx) per tap
    weight: (Cout, Cin//groups, kh, kw)
    """
    B, Cin, H, W = x.shape
    Cout, Cin_g, kh, kw = weight.shape
    groups = Cin // Cin_g
    sh, sw = stride
    ph, pw = padding
    dh, dw = dilation
    Hout = (H + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    Wout = (W + 2 * pw - dw * (kw - 1) - 1) // sw + 1
    n_off_grps = offset.shape[1] // (2 * kh * kw)
    assert Cin % n_off_grps == 0, (Cin, n_off_grps)

    offset = offset.reshape(B, n_off_grps, kh * kw, 2, Hout, Wout)

    # base output grid in input pixel coords
    ys = torch.arange(Hout, dtype=x.dtype) * sh - ph
    xs = torch.arange(Wout, dtype=x.dtype) * sw - pw
    base_y = ys.view(1, Hout, 1)
    base_x = xs.view(1, 1, Wout)

    out = x.new_zeros(B, Cout, Hout, Wout)
    w_flat = weight.reshape(Cout, Cin_g, kh * kw)
    xg = x.reshape(B * n_off_grps, Cin // n_off_grps, H, W)
    for k in range(kh * kw):
        i, j = divmod(k, kw)
        py = base_y + i * dh + offset[:, :, k, 0]            # (B,G,Ho,Wo)
        px = base_x + j * dw + offset[:, :, k, 1]
        gy = 2.0 * py / max(H - 1, 1) - 1.0
        gx = 2.0 * px / max(W - 1, 1) - 1.0
        grid = torch.stack([gx, gy], dim=-1).reshape(
            B * n_off_grps, Hout, Wout, 2)
        sampled = F.grid_sample(xg, grid, mode="bilinear",
                                padding_mode="zeros", align_corners=True)
        sampled = sampled.reshape(B, Cin, Hout, Wout)
        if mask is not None:
            m = mask.reshape(B, n_off_grps, kh * kw, Hout, Wout)[:, :, k]
            sampled = sampled * m.repeat_interleave(
                Cin // n_off_grps, dim=1)
        # grouped accumulate: (B, G, Cin_g, Ho, Wo) x (G, Cout_g, Cin_g)
        s = sampled.reshape(B, groups, Cin_g, Hout, Wout)
        wk = w_flat[:, :, k].reshape(groups, Cout // groups, Cin_g)
        out += torch.einsum("bgchw,goc->bgohw", s, wk).reshape(
            B, Cout, Hout, Wout)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


class _DeformConv2d(torch.nn.Module):
    """torchvision.ops.DeformConv2d (init matches torchvision: kaiming
    uniform a=sqrt(5) == default conv init)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias=True):
        super().__init__()
        to2 = lambda v: (v, v) if isinstance(v, int) else tuple(v)
        self.kernel_size = to2(kernel_size)
        self.stride = to2(stride)
        self.padding = to2(padding)
        self.dilation = to2(dilation)
        self.groups = groups
        self.weight = torch.nn.Parameter(torch.empty(
            out_channels, in_channels // groups, *self.kernel_size))
        self.bias = torch.nn.Parameter(
            torch.empty(out_channels)) if bias else None
        # same init as nn.Conv2d / torchvision DeformConv2d
        torch.nn.init.kaiming_uniform_(self.weight, a=5 ** 0.5)
        if self.bias is not None:
            fan_in = in_channels // groups * np.prod(self.kernel_size)
            bound = 1 / fan_in ** 0.5
            torch.nn.init.uniform_(self.bias, -bound, bound)

    def forward(self, x, offset, mask=None):
        return _deform_conv2d(x, offset, self.weight, self.bias,
                              self.stride, self.padding, self.dilation,
                              mask)


def install_torchvision_shim():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    ops.DeformConv2d = _DeformConv2d
    ops.deform_conv2d = _deform_conv2d
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops


# ---------------------------------------------------------------------------
# D3D shim: the reference's CUDA 3D deformable conv, re-expressed with
# F.grid_sample on 5D tensors (torch's trilinear sampler). Offset layout
# and sampling rule follow deform_im2col_cuda.cuh:192-265 exactly:
# offsets (B, dg*3*kd*kh*kw, Do, Ho, Wo), channels [3*tap+{0,1,2}] =
# (Δd, Δh, Δw) with taps row-major over (kd, kh, kw); sample point =
# out*stride - pad + tap*dilation + Δ; zeros outside.
# ---------------------------------------------------------------------------

def _deform_conv3d(x, offset, weight, bias, stride, padding, dilation,
                   groups, deformable_groups):
    B, Cin, D, H, W = x.shape
    Cout, Cin_g, kd, kh, kw = weight.shape
    sd_, sh, sw = stride
    pd, ph, pw = padding
    dd, dh, dw = dilation
    Do = (D + 2 * pd - dd * (kd - 1) - 1) // sd_ + 1
    Ho = (H + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    Wo = (W + 2 * pw - dw * (kw - 1) - 1) // sw + 1
    K = kd * kh * kw
    dg = deformable_groups
    offset = offset.reshape(B, dg, K, 3, Do, Ho, Wo)

    base_d = (torch.arange(Do, dtype=x.dtype) * sd_ - pd).view(1, Do, 1, 1)
    base_h = (torch.arange(Ho, dtype=x.dtype) * sh - ph).view(1, 1, Ho, 1)
    base_w = (torch.arange(Wo, dtype=x.dtype) * sw - pw).view(1, 1, 1, Wo)

    out = x.new_zeros(B, Cout, Do, Ho, Wo)
    w_flat = weight.reshape(Cout, Cin_g, K)
    xg = x.reshape(B * dg, Cin // dg, D, H, W)
    for k in range(K):
        i, rem = divmod(k, kh * kw)
        j, l = divmod(rem, kw)
        pz = base_d + i * dd + offset[:, :, k, 0]
        py = base_h + j * dh + offset[:, :, k, 1]
        px = base_w + l * dw + offset[:, :, k, 2]
        gz = 2.0 * pz / max(D - 1, 1) - 1.0
        gy = 2.0 * py / max(H - 1, 1) - 1.0
        gx = 2.0 * px / max(W - 1, 1) - 1.0
        grid = torch.stack([gx, gy, gz], dim=-1).reshape(
            B * dg, Do, Ho, Wo, 3)
        sampled = F.grid_sample(xg, grid, mode="bilinear",
                                padding_mode="zeros", align_corners=True)
        s = sampled.reshape(B, groups, Cin_g, Do, Ho, Wo)
        wk = w_flat[:, :, k].reshape(groups, Cout // groups, Cin_g)
        out += torch.einsum("bgcdhw,goc->bgodhw", s, wk).reshape(
            B, Cout, Do, Ho, Wo)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1, 1)
    return out


def install_d3d_shim():
    """Fake `D3D` extension module (forward only — golden tests don't
    backprop through the torch reference)."""
    if "D3D" in sys.modules:
        return
    d3d = types.ModuleType("D3D")

    def deform_conv_forward(inp, weight, bias, offset,
                            kd, kh, kw, sd_, sh, sw, pd, ph, pw,
                            dd, dh, dw, group, deformable_groups,
                            im2col_step):
        return _deform_conv3d(inp, offset, weight, bias,
                              (sd_, sh, sw), (pd, ph, pw), (dd, dh, dw),
                              group, deformable_groups)

    def deform_conv_backward(*a, **k):
        raise NotImplementedError("D3D shim is forward-only")

    d3d.deform_conv_forward = deform_conv_forward
    d3d.deform_conv_backward = deform_conv_backward
    sys.modules["D3D"] = d3d


# ---------------------------------------------------------------------------
# monai shim: only what dynunet_block.py / model_components.py use
# (Convolution with conv_only=True, Act/Norm tokens, get_act_layer,
# get_norm_layer) — semantics follow monai 0.9/1.x defaults: instance
# norm affine=False (torch default), batch norm affine=True, group norm
# affine=True.
# ---------------------------------------------------------------------------

def install_monai_shim():
    if "monai" in sys.modules:
        return
    import torch.nn as nn

    def _split(name):
        if isinstance(name, (tuple, list)):
            return str(name[0]).lower(), dict(name[1])
        return str(name).lower(), {}

    class Convolution(nn.Sequential):
        def __init__(self, spatial_dims, in_channels, out_channels,
                     strides=1, kernel_size=3, act="PRELU",
                     norm="INSTANCE", dropout=None, bias=True,
                     conv_only=False, is_transposed=False, padding=None,
                     output_padding=None, **kw):
            super().__init__()
            assert conv_only, "shim supports conv_only=True (all call" \
                              " sites in the reference use it)"
            conv_t = ([nn.ConvTranspose1d, nn.ConvTranspose2d,
                       nn.ConvTranspose3d] if is_transposed else
                      [nn.Conv1d, nn.Conv2d, nn.Conv3d])[spatial_dims - 1]
            if is_transposed:
                conv = conv_t(in_channels, out_channels, kernel_size,
                              stride=strides, padding=padding,
                              output_padding=output_padding, bias=bias)
            else:
                conv = conv_t(in_channels, out_channels, kernel_size,
                              stride=strides, padding=padding, bias=bias)
            self.add_module("conv", conv)

    class _Token:
        PRELU = "prelu"
        INSTANCE = "instance"
        BATCH = "batch"
        GROUP = "group"

        def __getitem__(self, k):
            return k

    def get_act_layer(name):
        n, kw = _split(name)
        kw.pop("inplace", None)
        table = {"leakyrelu": nn.LeakyReLU, "prelu": nn.PReLU,
                 "relu": nn.ReLU, "gelu": nn.GELU}
        return table[n](**kw)

    def get_norm_layer(name, spatial_dims=3, channels=1):
        n, kw = _split(name)
        if n == "instance":
            t = [nn.InstanceNorm1d, nn.InstanceNorm2d,
                 nn.InstanceNorm3d][spatial_dims - 1]
            return t(channels, **kw)
        if n == "batch":
            t = [nn.BatchNorm1d, nn.BatchNorm2d,
                 nn.BatchNorm3d][spatial_dims - 1]
            return t(channels, **kw)
        if n == "group":
            return nn.GroupNorm(num_channels=channels, **kw)
        raise KeyError(n)

    def optional_import(name, *a, **k):
        try:
            import importlib
            return importlib.import_module(name), True
        except ImportError:
            return None, False

    monai = types.ModuleType("monai")
    networks = types.ModuleType("monai.networks")
    blocks = types.ModuleType("monai.networks.blocks")
    convolutions = types.ModuleType("monai.networks.blocks.convolutions")
    layers = types.ModuleType("monai.networks.layers")
    factories = types.ModuleType("monai.networks.layers.factories")
    utils = types.ModuleType("monai.networks.layers.utils")
    mutils = types.ModuleType("monai.utils")
    mutils.optional_import = optional_import
    convolutions.Convolution = Convolution
    factories.Act = _Token()
    factories.Norm = _Token()
    utils.get_act_layer = get_act_layer
    utils.get_norm_layer = get_norm_layer
    monai.utils = mutils
    monai.networks = networks
    networks.blocks = blocks
    networks.layers = layers
    blocks.convolutions = convolutions
    layers.factories = factories
    layers.utils = utils
    for name, mod in [("monai", monai), ("monai.utils", mutils),
                      ("monai.networks", networks),
                      ("monai.networks.blocks", blocks),
                      ("monai.networks.blocks.convolutions", convolutions),
                      ("monai.networks.layers", layers),
                      ("monai.networks.layers.factories", factories),
                      ("monai.networks.layers.utils", utils)]:
        sys.modules[name] = mod


def install_monai_unetr_shim():
    """Extend the monai shim so the reference's UNETR
    (3D/pancreas_code/networks/unetr.py:22-229) imports and runs:

      * `monai.networks.blocks.dynunet_block.UnetOutBlock` and the
        UnetResBlock used inside the Unetr* blocks come from the
        reference's OWN vendored copy
        (3D/pancreas_code/networks/dynunet_block.py) loaded under the
        base shim — no re-implementation;
      * UnetrBasicBlock / UnetrPrUpBlock / UnetrUpBlock are re-typings
        of MONAI 0.7's (monai/networks/blocks/unetr_block.py):
        BasicBlock wraps UnetResBlock; PrUpBlock (conv_block=False) is
        a k2-s2 deconv chain; UpBlock is deconv → concat(skip) →
        UnetResBlock. All convs via the vendored get_conv_layer
        (bias=False, conv_only) so parameter names match the real
        MONAI state dict;
      * `monai.networks.nets.ViT` is a re-typing of MONAI 0.7's ViT
        (PatchEmbeddingBlock perceptron variant, SABlock with fused
        no-bias qkv, MLPBlock, pre-norm TransformerBlock; forward
        returns (normed tokens, per-block hidden states)).
    """
    install_monai_shim()
    import importlib.util
    import torch.nn as nn
    from einops.layers.torch import Rearrange

    blocks_mod = sys.modules["monai.networks.blocks"]
    if hasattr(blocks_mod, "UnetrBasicBlock"):
        return

    spec = importlib.util.spec_from_file_location(
        "pancreas_dynunet_block",
        "/root/reference/3D/pancreas_code/networks/dynunet_block.py")
    dyn = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dyn)

    class UnetrBasicBlock(nn.Module):
        def __init__(self, spatial_dims, in_channels, out_channels,
                     kernel_size, stride, norm_name, res_block=False):
            super().__init__()
            cls = dyn.UnetResBlock if res_block else dyn.UnetBasicBlock
            self.layer = cls(spatial_dims, in_channels, out_channels,
                             kernel_size=kernel_size, stride=stride,
                             norm_name=norm_name)

        def forward(self, inp):
            return self.layer(inp)

    class UnetrPrUpBlock(nn.Module):
        def __init__(self, spatial_dims, in_channels, out_channels,
                     num_layer, kernel_size, stride,
                     upsample_kernel_size, norm_name,
                     conv_block=False, res_block=False):
            super().__init__()
            assert not conv_block, "shim covers conv_block=False (the" \
                                   " reference UNETR default)"
            u = upsample_kernel_size
            self.transp_conv_init = dyn.get_conv_layer(
                spatial_dims, in_channels, out_channels, kernel_size=u,
                stride=u, conv_only=True, is_transposed=True)
            self.blocks = nn.ModuleList([
                dyn.get_conv_layer(
                    spatial_dims, out_channels, out_channels,
                    kernel_size=u, stride=u, conv_only=True,
                    is_transposed=True)
                for _ in range(num_layer)])

        def forward(self, x):
            x = self.transp_conv_init(x)
            for blk in self.blocks:
                x = blk(x)
            return x

    class UnetrUpBlock(nn.Module):
        def __init__(self, spatial_dims, in_channels, out_channels,
                     kernel_size, upsample_kernel_size, norm_name,
                     res_block=False):
            super().__init__()
            u = upsample_kernel_size
            self.transp_conv = dyn.get_conv_layer(
                spatial_dims, in_channels, out_channels, kernel_size=u,
                stride=u, conv_only=True, is_transposed=True)
            cls = dyn.UnetResBlock if res_block else dyn.UnetBasicBlock
            self.conv_block = cls(
                spatial_dims, out_channels + out_channels, out_channels,
                kernel_size=kernel_size, stride=1, norm_name=norm_name)

        def forward(self, inp, skip):
            out = self.transp_conv(inp)
            out = torch.cat((out, skip), dim=1)
            return self.conv_block(out)

    class PatchEmbeddingBlock(nn.Module):
        def __init__(self, in_channels, img_size, patch_size,
                     hidden_size, num_heads, pos_embed,
                     dropout_rate=0.0):
            super().__init__()
            assert pos_embed == "perceptron", "shim covers the" \
                " reference UNETR default (pos_embed='perceptron')"
            n_patches = 1
            patch_dim = in_channels
            for i, p in zip(img_size, patch_size):
                n_patches *= i // p
                patch_dim *= p
            self.patch_embeddings = nn.Sequential(
                Rearrange("b c (h p1) (w p2) (d p3) -> b (h w d)"
                          " (p1 p2 p3 c)",
                          p1=patch_size[0], p2=patch_size[1],
                          p3=patch_size[2]),
                nn.Linear(patch_dim, hidden_size))
            self.position_embeddings = nn.Parameter(
                torch.zeros(1, n_patches, hidden_size))
            self.dropout = nn.Dropout(dropout_rate)

        def forward(self, x):
            x = self.patch_embeddings(x)
            x = x + self.position_embeddings
            return self.dropout(x)

    class SABlock(nn.Module):
        def __init__(self, hidden_size, num_heads, dropout_rate=0.0):
            super().__init__()
            self.num_heads = num_heads
            self.head_dim = hidden_size // num_heads
            self.scale = self.head_dim ** -0.5
            self.qkv = nn.Linear(hidden_size, hidden_size * 3,
                                 bias=False)
            self.out_proj = nn.Linear(hidden_size, hidden_size)
            self.drop_weights = nn.Dropout(dropout_rate)
            self.drop_output = nn.Dropout(dropout_rate)

        def forward(self, x):
            b, n, _ = x.shape
            qkv = self.qkv(x).reshape(
                b, n, 3, self.num_heads, self.head_dim)
            qkv = qkv.permute(2, 0, 3, 1, 4)  # qkv b heads n d
            q, k, v = qkv[0], qkv[1], qkv[2]
            att = (torch.einsum("blxd,blyd->blxy", q, k)
                   * self.scale).softmax(dim=-1)
            att = self.drop_weights(att)
            o = torch.einsum("bhxy,bhyd->bhxd", att, v)
            o = o.permute(0, 2, 1, 3).reshape(b, n, -1)
            return self.drop_output(self.out_proj(o))

    class MLPBlock(nn.Module):
        def __init__(self, hidden_size, mlp_dim, dropout_rate=0.0):
            super().__init__()
            self.linear1 = nn.Linear(hidden_size, mlp_dim)
            self.linear2 = nn.Linear(mlp_dim, hidden_size)
            self.fn = nn.GELU()
            self.drop1 = nn.Dropout(dropout_rate)
            self.drop2 = nn.Dropout(dropout_rate)

        def forward(self, x):
            return self.drop2(
                self.linear2(self.drop1(self.fn(self.linear1(x)))))

    class TransformerBlock(nn.Module):
        def __init__(self, hidden_size, mlp_dim, num_heads,
                     dropout_rate=0.0):
            super().__init__()
            self.mlp = MLPBlock(hidden_size, mlp_dim, dropout_rate)
            self.norm1 = nn.LayerNorm(hidden_size)
            self.attn = SABlock(hidden_size, num_heads, dropout_rate)
            self.norm2 = nn.LayerNorm(hidden_size)

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            x = x + self.mlp(self.norm2(x))
            return x

    class ViT(nn.Module):
        def __init__(self, in_channels, img_size, patch_size,
                     hidden_size=768, mlp_dim=3072, num_layers=12,
                     num_heads=12, pos_embed="perceptron",
                     classification=False, dropout_rate=0.0):
            super().__init__()
            assert not classification
            self.patch_embedding = PatchEmbeddingBlock(
                in_channels, img_size, patch_size, hidden_size,
                num_heads, pos_embed, dropout_rate)
            self.blocks = nn.ModuleList([
                TransformerBlock(hidden_size, mlp_dim, num_heads,
                                 dropout_rate)
                for _ in range(num_layers)])
            self.norm = nn.LayerNorm(hidden_size)

        def forward(self, x):
            x = self.patch_embedding(x)
            hidden_states_out = []
            for blk in self.blocks:
                x = blk(x)
                hidden_states_out.append(x)
            x = self.norm(x)
            return x, hidden_states_out

    dynunet_mod = types.ModuleType("monai.networks.blocks.dynunet_block")
    dynunet_mod.UnetOutBlock = dyn.UnetOutBlock
    dynunet_mod.UnetResBlock = dyn.UnetResBlock
    dynunet_mod.UnetBasicBlock = dyn.UnetBasicBlock
    dynunet_mod.get_conv_layer = dyn.get_conv_layer
    nets_mod = types.ModuleType("monai.networks.nets")
    nets_mod.ViT = ViT
    blocks_mod.UnetrBasicBlock = UnetrBasicBlock
    blocks_mod.UnetrPrUpBlock = UnetrPrUpBlock
    blocks_mod.UnetrUpBlock = UnetrUpBlock
    blocks_mod.dynunet_block = dynunet_mod
    sys.modules["monai.networks.blocks.dynunet_block"] = dynunet_mod
    sys.modules["monai.networks.nets"] = nets_mod
    sys.modules["monai.networks"].nets = nets_mod


def install_batchgenerators_shim():
    """neural_network.py imports pad_nd_image at module level; a stub is
    enough for constructing/forwarding the models."""
    if "batchgenerators" in sys.modules:
        return
    bg = types.ModuleType("batchgenerators")
    aug = types.ModuleType("batchgenerators.augmentations")
    utils = types.ModuleType("batchgenerators.augmentations.utils")

    def pad_nd_image(*a, **k):
        raise NotImplementedError("batchgenerators shim: predict-time "
                                  "padding not available in golden tests")

    utils.pad_nd_image = pad_nd_image
    bg.augmentations = aug
    aug.utils = utils
    sys.modules["batchgenerators"] = bg
    sys.modules["batchgenerators.augmentations"] = aug
    sys.modules["batchgenerators.augmentations.utils"] = utils


# ---------------------------------------------------------------------------
# timm shim: alias the reference's vendored models_timm
# ---------------------------------------------------------------------------

def install_timm_shim():
    if "timm" in sys.modules:
        return
    if REF2D not in sys.path:
        sys.path.insert(0, REF2D)
    timm = types.ModuleType("timm")
    timm.__version__ = "0.6.12+refshim"
    data = types.ModuleType("timm.data")
    data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    data.IMAGENET_INCEPTION_MEAN = (0.5, 0.5, 0.5)
    data.IMAGENET_INCEPTION_STD = (0.5, 0.5, 0.5)
    models = types.ModuleType("timm.models")
    sys.modules["timm"] = timm
    sys.modules["timm.data"] = data
    sys.modules["timm.models"] = models
    timm.data, timm.models = data, models
    from networks.merit_lib.models_timm import layers as vendored_layers
    sys.modules["timm.models.layers"] = vendored_layers
    models.layers = vendored_layers


def install_fvcore_shim():
    """deformable_LKA.py:160 imports fvcore at module level (for its
    __main__ FLOPs printout); a stub suffices for importing the models."""
    if "fvcore" in sys.modules:
        return
    fvcore = types.ModuleType("fvcore")
    fnn = types.ModuleType("fvcore.nn")
    fnn.FlopCountAnalysis = None
    fnn.flop_count_table = None
    fnn.parameter_count_table = None
    fvcore.nn = fnn
    sys.modules["fvcore"] = fvcore
    sys.modules["fvcore.nn"] = fnn


def install_dataclass_compat():
    """The vendored maxxvit_4out.py uses nested-dataclass defaults
    (`conv_cfg: MaxxVitConvCfg = MaxxVitConvCfg()`), legal on the
    reference's Python but rejected by >=3.12 ('mutable default ... use
    default_factory'). Rewrite such defaults to default_factory copies
    at class-creation time, preserving the intended semantics."""
    import dataclasses

    if getattr(dataclasses._get_field, "_ref_harness_patch", False):
        return
    orig = dataclasses._get_field

    def patched(cls, a_name, a_type, *args, **kwargs):
        default = getattr(cls, a_name, dataclasses.MISSING)
        if (default is not dataclasses.MISSING
                and not isinstance(default, dataclasses.Field)
                and dataclasses.is_dataclass(default)
                and type(default).__hash__ is None):
            setattr(cls, a_name, dataclasses.field(
                default_factory=lambda d=default: dataclasses.replace(d)))
        return orig(cls, a_name, a_type, *args, **kwargs)

    patched._ref_harness_patch = True
    dataclasses._get_field = patched


def install_networks_path_shims():
    """mvit_LKA_Decoder.py does `from segformer import *` (plain module
    name → needs 2D/networks on sys.path) and
    STViTEncoder_LKADecoder.py:24 imports mmdet.utils.get_root_logger
    (only for pretrained-load logging); stub both."""
    nets = os.path.join(REF2D, "networks")
    if nets not in sys.path:
        sys.path.insert(0, nets)
    if "mmdet" not in sys.modules:
        import logging
        mmdet = types.ModuleType("mmdet")
        mmdet_utils = types.ModuleType("mmdet.utils")
        mmdet_utils.get_root_logger = (
            lambda *a, **k: logging.getLogger("ref_harness"))
        mmdet.utils = mmdet_utils
        sys.modules["mmdet"] = mmdet
        sys.modules["mmdet.utils"] = mmdet_utils


def install_all():
    install_dataclass_compat()
    install_torchvision_shim()
    install_timm_shim()
    install_fvcore_shim()
    install_networks_path_shims()


def install_all_3d():
    """Shims + sys.path for importing /root/reference/3D models."""
    install_all()
    install_d3d_shim()
    install_monai_shim()
    install_batchgenerators_shim()
    if REF3D not in sys.path:
        sys.path.insert(0, REF3D)


def build_reference_3d_flagship(num_classes=14, seed=0,
                                crop_size=(64, 128, 128),
                                depths=(3, 3, 3, 3)):
    """Random-init D_LKA_Former (d_lka_former_synapse.py:8-167) with the
    published block, eval mode, on CPU via the D3D/monai shims.

    The published encoder/decoder hardcode per-stage token counts for
    the Synapse crop 64x128x128 (model_components.py:14 default
    input_size, d_lka_former_synapse.py:96-130 out_size) and allocate a
    ZERO-init `pos_embed` Parameter of that length
    (transformerblock.py:615, never touched by _init_weights). For a
    smaller golden crop we re-allocate each pos_embed at the scaled
    token count — and randomize it, so pos_embed conversion is actually
    exercised (at the published size it is always zero at random init).
    """
    install_all_3d()
    torch.manual_seed(seed)
    from d_lka_former.network_architecture.synapse.d_lka_former_synapse \
        import D_LKA_Former
    from d_lka_former.network_architecture.synapse.transformerblock \
        import TransformerBlock_3D_single_deform_LKA
    model = D_LKA_Former(
        in_channels=1, out_channels=num_classes, img_size=list(crop_size),
        depths=list(depths), dims=[32, 64, 128, 256],
        do_ds=True, trans_block=TransformerBlock_3D_single_deform_LKA)
    ratio = (64 * 128 * 128) // int(np.prod(crop_size))
    for m in model.modules():
        pe = getattr(m, "pos_embed", None)
        if isinstance(pe, torch.nn.Parameter):
            n = pe.shape[1] // ratio
            m.pos_embed = torch.nn.Parameter(
                0.02 * torch.randn(1, n, pe.shape[2]))
    return model.eval()


@contextlib.contextmanager
def no_pretrained_load():
    """MaxViT4Out_Small unconditionally torch.load()s an ImageNet pth;
    make that a no-op (random init) for golden tests."""
    orig = torch.load
    torch.load = lambda *a, **k: {}
    try:
        yield
    finally:
        torch.load = orig


def build_reference_2d_flagship(num_classes=9, seed=0):
    """Random-init MaxViT_deformableLKAFormer from the real reference
    code (MaxViT_deform_LKA.py:634-696), eval mode."""
    install_all()
    torch.manual_seed(seed)
    with no_pretrained_load():
        from networks.MaxViT_deform_LKA import MaxViT_deformableLKAFormer
        model = MaxViT_deformableLKAFormer(num_classes=num_classes)
    return model.eval()


def state_dict_numpy(model):
    return {k: v.detach().cpu().numpy()
            for k, v in model.state_dict().items()}


# ---------------------------------------------------------------------------
# HiFormer support: torchvision resnet + timm ViT block shims.
#
# torchvision is absent in this image; PyramidFeatures (Encoder.py:125)
# builds `torchvision.models.resnet34()` and keeps children[:7]. The
# resnet34 below is the standard torchvision architecture (BasicBlock
# [3,4,6,3]) with the same child order, so children[:7] slices
# identically. timm.models.vision_transformer.{Mlp,Block} are the
# standard pre-norm ViT pieces HiFormer's MultiScaleBlock stacks
# (utils.py:483).
# ---------------------------------------------------------------------------

def _install_resnet_shim():
    import torch
    import torch.nn as nn
    tv = sys.modules.get("torchvision")
    if tv is None:
        install_torchvision_shim()
        tv = sys.modules["torchvision"]
    if hasattr(tv, "models"):
        return

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, cin, cout, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            idt = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                idt = self.downsample(x)
            return self.relu(out + idt)

    class ResNet(nn.Module):
        def __init__(self, layers):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = self._make_layer(64, layers[0])
            self.layer2 = self._make_layer(128, layers[1], 2)
            self.layer3 = self._make_layer(256, layers[2], 2)
            self.layer4 = self._make_layer(512, layers[3], 2)
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc = nn.Linear(512, 1000)

        def _make_layer(self, planes, blocks, stride=1):
            downsample = None
            if stride != 1 or self.inplanes != planes:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes, 1, stride,
                              bias=False),
                    nn.BatchNorm2d(planes))
            layers = [BasicBlock(self.inplanes, planes, stride,
                                 downsample)]
            self.inplanes = planes
            for _ in range(1, blocks):
                layers.append(BasicBlock(planes, planes))
            return nn.Sequential(*layers)

        def forward(self, x):  # unused by PyramidFeatures
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for l in (self.layer1, self.layer2, self.layer3, self.layer4):
                x = l(x)
            return self.fc(torch.flatten(self.avgpool(x), 1))

    models = types.ModuleType("torchvision.models")
    models.resnet34 = lambda pretrained=False, **kw: ResNet([3, 4, 6, 3])
    tv.models = models
    sys.modules["torchvision.models"] = models


def _install_vit_shim():
    import torch
    import torch.nn as nn
    if "timm.models.vision_transformer" in sys.modules:
        return

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=nn.GELU, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, out_features)
            self.drop = nn.Dropout(drop)

        def forward(self, x):
            return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))

    class Attention(nn.Module):
        def __init__(self, dim, num_heads=8, qkv_bias=False,
                     attn_drop=0.0, proj_drop=0.0):
            super().__init__()
            self.num_heads = num_heads
            self.scale = (dim // num_heads) ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.attn_drop = nn.Dropout(attn_drop)
            self.proj = nn.Linear(dim, dim)
            self.proj_drop = nn.Dropout(proj_drop)

        def forward(self, x):
            B, N, C = x.shape
            h = self.num_heads
            qkv = self.qkv(x).reshape(B, N, 3, h, C // h)
            qkv = qkv.permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) * self.scale
            attn = self.attn_drop(attn.softmax(dim=-1))
            x = (attn @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj_drop(self.proj(x))

    class Block(nn.Module):
        def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=False,
                     drop=0.0, attn_drop=0.0, drop_path=0.0,
                     act_layer=nn.GELU, norm_layer=nn.LayerNorm):
            super().__init__()
            self.norm1 = norm_layer(dim)
            self.attn = Attention(dim, num_heads, qkv_bias, attn_drop,
                                  drop)
            self.norm2 = norm_layer(dim)
            self.mlp = Mlp(dim, int(dim * mlp_ratio),
                           act_layer=act_layer, drop=drop)

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    def _cfg(url="", **kwargs):
        return {"url": url, **kwargs}

    vt = types.ModuleType("timm.models.vision_transformer")
    vt.Mlp, vt.Attention, vt.Block, vt._cfg = Mlp, Attention, Block, _cfg
    sys.modules["timm.models.vision_transformer"] = vt
    sys.modules["timm.models"].vision_transformer = vt


def install_skin_path():
    """sys.path + stubs for importing /root/reference/2D/skin_code
    models (hiformer, vit_seg_modeling/TransUNet). medpy/SimpleITK are
    imported by trailing test sections only — stub them."""
    install_all()
    _install_resnet_shim()
    _install_vit_shim()
    for name in ("medpy", "medpy.metric", "SimpleITK"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["medpy"].metric = sys.modules["medpy.metric"]
    skin = os.path.join(REF2D, "skin_code")
    if skin not in sys.path:
        sys.path.insert(0, skin)


def hiformer_s_config(tmpdir):
    """HiFormer-S config (HiFormer_configs.py:10-40) with pretrained
    loads neutralised: resnet rand-init, and swin_pretrained_path
    pointing at a generated random swin-tiny-style checkpoint carrying
    exactly the keys PyramidFeatures consumes (Encoder.py:115-152)."""
    import os
    import torch
    import ml_collections
    install_skin_path()
    from model.hiformer import Encoder as E

    sw = E.SwinTransformer(224, in_chans=3)
    sd = {k: v.clone() for k, v in sw.state_dict().items()}
    torch.manual_seed(7)
    for L, dim in ((0, 96), (1, 192)):
        sd[f"layers.{L}.downsample.reduction.weight"] = \
            torch.randn(2 * dim, 4 * dim) * 0.02
        sd[f"layers.{L}.downsample.norm.weight"] = torch.ones(4 * dim)
        sd[f"layers.{L}.downsample.norm.bias"] = torch.zeros(4 * dim)
    path = os.path.join(str(tmpdir), "fake_swin_tiny.pth")
    torch.save({"model": sd}, path)

    cfg = ml_collections.ConfigDict()
    cfg.swin_pyramid_fm = [96, 192, 384]
    cfg.image_size = 224
    cfg.patch_size = 4
    cfg.num_classes = 9
    cfg.swin_pretrained_path = path
    cfg.cnn_backbone = "resnet34"
    cfg.cnn_pyramid_fm = [64, 128, 256]
    cfg.resnet_pretrained = False
    cfg.depth = [[1, 1, 0]]
    cfg.num_heads = (3, 3)
    cfg.mlp_ratio = (1.0, 1.0, 1.0)
    cfg.drop_rate = 0.0
    cfg.attn_drop_rate = 0.0
    cfg.drop_path_rate = 0.0
    cfg.qkv_bias = True
    cfg.qk_scale = None
    cfg.cross_pos_embed = True
    return cfg


def build_reference_acdc(num_classes=4, seed=0, crop_size=(8, 64, 64),
                         depths=(1, 1, 1, 1)):
    """Random-init ACDC D_LKA_Former (acdc/d_lka_former_acdc.py:8-125)
    with the published deform block, eval mode. The class hardcodes the
    (16,160,160)-crop bottleneck feat_size=(2,5,5)
    (d_lka_former_acdc.py:59); for a small golden crop we overwrite it
    with the derived (D/8, H/32, W/32) — the only place the crop enters
    the module (proj_feat view). The deform block family carries no
    pos-embed (acdc/transformerblock.py:189), so input_size/out_size
    args are dead for this config."""
    install_all_3d()
    torch.manual_seed(seed)
    from d_lka_former.network_architecture.acdc.d_lka_former_acdc \
        import D_LKA_Former as ACDCFormer
    from d_lka_former.network_architecture.acdc.transformerblock \
        import TransformerBlock_3D_single_deform_LKA as TB
    model = ACDCFormer(in_channels=1, out_channels=num_classes,
                       depths=list(depths), dims=[32, 64, 128, 256],
                       do_ds=True, trans_block=TB)
    model.feat_size = (crop_size[0] // 8, crop_size[1] // 32,
                       crop_size[2] // 32)
    # Unlike the Synapse flagship block, the ACDC variant allocates and
    # USES a pos_embed sized to the full (16,160,160) crop's per-stage
    # token counts (acdc/transformerblock.py:189-199, encoder stage
    # input_size list in acdc/model_components.py:14). Re-allocate each
    # at the golden crop's token count (and randomise, so conversion is
    # exercised).
    D, H, W = crop_size
    tokens = {}
    for i in range(4):
        full = (16 // 2 ** i) * (40 // 2 ** i) * (40 // 2 ** i)
        tokens[full] = (D // 2 ** i) * (H // 4 // 2 ** i) * (W // 4 // 2 ** i)
    for mmod in model.modules():
        pe = getattr(mmod, "pos_embed", None)
        if isinstance(pe, torch.nn.Parameter):
            mmod.pos_embed = torch.nn.Parameter(
                0.02 * torch.randn(1, tokens[pe.shape[1]], pe.shape[2]))
    return model.eval()


@contextlib.contextmanager
def pancreas_networks_package():
    """Import context for /root/reference/3D/pancreas_code, whose
    modules use absolute `networks.*` imports that collide with the 2D
    reference's `networks` package. Temporarily swaps any loaded
    `networks*` modules out of sys.modules, puts pancreas_code on
    sys.path, and restores everything afterwards (the imported classes
    keep working through their own module globals)."""
    saved = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k == "networks" or k.startswith("networks.")}
    root = os.path.join(REF3D, "pancreas_code")
    sys.path.insert(0, root)
    try:
        yield
    finally:
        sys.path.remove(root)
        for k in list(sys.modules):
            if k == "networks" or k.startswith("networks."):
                del sys.modules[k]
        sys.modules.update(saved)


def build_reference_pancreas_net(num_classes=2, seed=0,
                                 crop_size=(32, 32, 32),
                                 depths=(1, 1, 1, 1)):
    """Random-init pancreas D_LKA_Net (pancreas_code/networks/
    d_lka_former/d_lka_net_synapse.py:9-167) with the published deform
    block and the train_pancreas.py:109-117 config axes (patch (2,2,2),
    img_size parameterised -> feat_size derived, so a small golden crop
    needs no surgery). unetr_pp-prefixed keys exercise the converter's
    rename path (3D/rename_layers.py:12-23)."""
    install_all_3d()
    torch.manual_seed(seed)
    # D_LKA_Net does NOT derive per-stage token counts from img_size
    # (d_lka_net_synapse.py:28 default input_size list is the 64x128x128
    # patch's) — pass the counts for the golden crop, as
    # train_pancreas.py:109-117 does for 96^3.
    D, H, W = crop_size
    input_size = [(D // 2 // 2 ** i) * (H // 2 // 2 ** i)
                  * (W // 2 // 2 ** i) for i in range(4)]
    with pancreas_networks_package():
        from networks.d_lka_former.d_lka_net_synapse import D_LKA_Net
        from networks.d_lka_former.transformerblock \
            import TransformerBlock_3D_single_deform_LKA as TB
        model = D_LKA_Net(in_channels=1, out_channels=num_classes,
                          img_size=list(crop_size),
                          patch_size=(2, 2, 2), input_size=input_size,
                          depths=list(depths), dims=[32, 64, 128, 256],
                          do_ds=True, trans_block=TB)
    # randomise the zero-init pos_embeds so conversion is exercised
    for mmod in model.modules():
        pe = getattr(mmod, "pos_embed", None)
        if isinstance(pe, torch.nn.Parameter):
            with torch.no_grad():
                pe.normal_(0, 0.02)
    return model.eval()
