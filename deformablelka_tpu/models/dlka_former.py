"""3D D-LKA Former — hierarchical encoder/decoder (channels-last NDHWC).

Parity targets:
  /root/reference/3D/d_lka_former/network_architecture/synapse/
    d_lka_former_synapse.py:8-167  (D_LKA_Former: stem patch (2,4,4), dims
    [32,64,128,256], depths [3,3,3,3], full-res UnetResBlock branch,
    4 up-blocks, deep-supervision heads out1/out2/out3)
    model_components.py:13-150     (encoder stem conv+groupnorm, 3 stride-2
    downsample convs + groupnorm, stages of trans blocks; up-block =
    transposed conv + additive skip + 3 trans blocks; proj_size
    [64,64,64,32], transformer dropout 0.15)
  ACDC variant: acdc/d_lka_former_acdc.py:8-125 (patch (1,4,4), crop
    16×160×160).
  Pancreas D_LKA_Net: 3D/pancreas_code/networks/d_lka_former/
    d_lka_net_synapse.py:9-130 (patch (2,2,2), 96³ inputs).

TPU-first notes: encoder/decoder stages are static-shape NDHWC convs and
einsum attention; everything jit-compiles to a single XLA program. The
sliding-window engine (inference/sliding_window.py) drives this model.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from deformablelka_tpu.nn.layers import Conv3d
from deformablelka_tpu.nn.norms import GroupNorm
from deformablelka_tpu.nn.dynunet import UnetResBlock, UnetOutBlock
from deformablelka_tpu.nn.layers import ConvTranspose
from deformablelka_tpu.nn.transformer3d import TRANSFORMER_BLOCKS


class Encoder(nn.Module):
    """Stem + 3 downsamples, each followed by a stack of transformer blocks
    (model_components.py:13-66)."""
    dims: Sequence[int]
    depths: Sequence[int]
    input_sizes: Sequence[int]
    proj_sizes: Sequence[int]
    patch_size: Tuple[int, int, int]
    num_heads: int = 4
    transformer_dropout_rate: float = 0.15
    trans_block: str = "TransformerBlock"
    deterministic: bool = True
    remat: bool = False  # jax.checkpoint each block (training memory)

    @nn.compact
    def __call__(self, x):
        block_cls = TRANSFORMER_BLOCKS[self.trans_block]
        if self.remat:
            block_cls = nn.remat(block_cls)
        in_channels = x.shape[-1]
        hidden_states = []
        for i in range(4):
            if i == 0:
                x = Conv3d(self.dims[0], self.patch_size,
                           stride=self.patch_size, padding=0, use_bias=False,
                           name="stem_conv")(x)
                x = GroupNorm(num_groups=in_channels, name="stem_norm")(x)
            else:
                x = Conv3d(self.dims[i], 2, stride=2, padding=0,
                           use_bias=False, name=f"down{i}_conv")(x)
                x = GroupNorm(num_groups=self.dims[i - 1],
                              name=f"down{i}_norm")(x)
            for j in range(self.depths[i]):
                x = block_cls(
                    input_size=self.input_sizes[i],
                    hidden_size=self.dims[i],
                    proj_size=self.proj_sizes[i],
                    num_heads=self.num_heads,
                    dropout_rate=self.transformer_dropout_rate,
                    pos_embed=True,
                    deterministic=self.deterministic,
                    name=f"stage{i}_block{j}")(x)
            hidden_states.append(x)
        return x, hidden_states


class UpBlock(nn.Module):
    """Transposed-conv upsample + optional additive skip + trans blocks
    (model_components.py:73-150)."""
    out_channels: int
    upsample_kernel_size: Sequence[int] | int
    out_size: int
    proj_size: int = 64
    num_heads: int = 4
    depth: int = 3
    conv_decoder: bool = False
    trans_block: str = "TransformerBlock"
    use_skip: bool = True
    deterministic: bool = True
    remat: bool = False

    @nn.compact
    def __call__(self, x, skip):
        out = ConvTranspose(self.out_channels, self.upsample_kernel_size,
                            stride=self.upsample_kernel_size, use_bias=False,
                            name="transp_conv")(x)
        if self.use_skip:
            out = out + skip
        if self.conv_decoder:
            # norm_name "instance" per d_lka_former_synapse.py:23 default
            # flowing into D_LKA_FormerUpBlock (model_components.py:123-125).
            out = UnetResBlock(3, self.out_channels, kernel_size=3, stride=1,
                               norm_name="instance", name="decoder_block")(out)
        else:
            block_cls = TRANSFORMER_BLOCKS[self.trans_block]
            if self.remat:
                block_cls = nn.remat(block_cls)
            for j in range(self.depth):
                out = block_cls(
                    input_size=self.out_size,
                    hidden_size=self.out_channels,
                    proj_size=self.proj_size,
                    num_heads=self.num_heads,
                    dropout_rate=0.15,
                    pos_embed=True,
                    deterministic=self.deterministic,
                    name=f"decoder_block{j}")(out)
        return out


class DLKAFormer(nn.Module):
    """The 3D flagship. Input (B, S1, S2, S3, Cin); returns list of
    deep-supervision logits [full, 1/2(s), 1/4(s)] when do_ds else the
    full-res logits, all channels-last."""
    out_channels: int
    img_size: Tuple[int, int, int] = (64, 128, 128)
    patch_size: Tuple[int, int, int] = (2, 4, 4)
    feature_size: int = 16
    hidden_size: int = 256
    num_heads: int = 4
    depths: Sequence[int] = (3, 3, 3, 3)
    dims: Sequence[int] = (32, 64, 128, 256)
    proj_sizes: Sequence[int] = (64, 64, 64, 32)
    do_ds: bool = True
    trans_block: str = "TransformerBlock_3D_single_deform_LKA"
    skip_connections: Sequence[bool] = (True, True, True, True)
    deterministic: bool = True
    # rematerialise every transformer block under autodiff
    # (jax.checkpoint via nn.remat): trades recompute for activation
    # memory — without it a batch-2 training step at the Synapse patch
    # needs 24.9 GB HBM (> v5e's 16 GB, measured); with it both batch
    # sizes fit. Inference is unaffected (no cotangents to store).
    remat: bool = False

    @nn.compact
    def __call__(self, x_in):
        ps = self.patch_size
        s = [self.img_size[i] // ps[i] for i in range(3)]  # stage-0 size
        sizes = [tuple(v // (2 ** i) for v in s) for i in range(4)]
        input_sizes = [int(np.prod(sz)) for sz in sizes]

        _, hidden = Encoder(
            dims=self.dims, depths=self.depths, input_sizes=input_sizes,
            proj_sizes=self.proj_sizes, patch_size=ps,
            num_heads=self.num_heads, trans_block=self.trans_block,
            deterministic=self.deterministic, remat=self.remat,
            name="encoder")(x_in)

        conv_block = UnetResBlock(3, self.feature_size, kernel_size=3,
                                  stride=1, norm_name="instance",
                                  name="encoder1")(x_in)

        enc1, enc2, enc3, enc4 = hidden
        fs = self.feature_size
        dec3 = UpBlock(out_channels=fs * 8, upsample_kernel_size=2,
                       out_size=input_sizes[2],
                       trans_block=self.trans_block,
                       use_skip=self.skip_connections[0],
                       deterministic=self.deterministic,
                       remat=self.remat,
                       name="decoder5")(enc4, enc3)
        dec2 = UpBlock(out_channels=fs * 4, upsample_kernel_size=2,
                       out_size=input_sizes[1],
                       trans_block=self.trans_block,
                       use_skip=self.skip_connections[1],
                       deterministic=self.deterministic,
                       remat=self.remat,
                       name="decoder4")(dec3, enc2)
        dec1 = UpBlock(out_channels=fs * 2, upsample_kernel_size=2,
                       out_size=input_sizes[0],
                       trans_block=self.trans_block,
                       use_skip=self.skip_connections[2],
                       deterministic=self.deterministic,
                       remat=self.remat,
                       name="decoder3")(dec2, enc1)
        out = UpBlock(out_channels=fs, upsample_kernel_size=ps,
                      out_size=int(np.prod(self.img_size)),
                      conv_decoder=True,
                      trans_block=self.trans_block,
                      use_skip=self.skip_connections[3],
                      deterministic=self.deterministic,
                      remat=self.remat,
                      name="decoder2")(dec1, conv_block)

        logits1 = UnetOutBlock(3, self.out_channels, name="out1")(out)
        if self.do_ds:
            logits2 = UnetOutBlock(3, self.out_channels, name="out2")(dec1)
            logits3 = UnetOutBlock(3, self.out_channels, name="out3")(dec2)
            return [logits1, logits2, logits3]
        return logits1


def dlka_former_synapse(num_classes: int = 14, do_ds: bool = True,
                        trans_block: str = "TransformerBlock_3D_single_deform_LKA",
                        deterministic: bool = True,
                        img_size=(64, 128, 128),
                        remat: bool = False) -> DLKAFormer:
    """Synapse config (run/default_configuration.py:62-69 hard-patches
    patch 64×128×128; out_channels from plans — 14 for raw Synapse labels,
    remapped to 9 for the paper's 8-organ eval)."""
    return DLKAFormer(out_channels=num_classes, img_size=tuple(img_size),
                      patch_size=(2, 4, 4), do_ds=do_ds,
                      trans_block=trans_block, deterministic=deterministic,
                      remat=remat)


def dlka_former_acdc(num_classes: int = 4, do_ds: bool = True,
                     trans_block: str = "TransformerBlock_3D_single_deform_LKA",
                     deterministic: bool = True,
                     img_size=(16, 160, 160),
                     remat: bool = False) -> DLKAFormer:
    """ACDC config (d_lka_former_trainer_acdc.py:93-94: crop [16,160,160],
    embedding patch (1,4,4)).

    The ACDC transformerblock.py defines its own
    TransformerBlock_3D_single_deform_LKA with dim-dependent ANISOTROPIC
    gate kernels (acdc/transformerblock.py:211-252) — different from the
    Synapse class of the same name — so the CLI block name maps onto the
    `_acdc` registry variant here (golden-tested:
    tests/test_golden_3d.py::test_golden_acdc_full_model_parity)."""
    if trans_block == "TransformerBlock_3D_single_deform_LKA":
        trans_block = "TransformerBlock_3D_single_deform_LKA_acdc"
    return DLKAFormer(out_channels=num_classes, img_size=tuple(img_size),
                      patch_size=(1, 4, 4), do_ds=do_ds,
                      trans_block=trans_block, deterministic=deterministic,
                      remat=remat)


def dlka_net_pancreas(num_classes: int = 2, do_ds: bool = False,
                      trans_block: str = "TransformerBlock_3D_single_deform_LKA",
                      deterministic: bool = True,
                      img_size=(96, 96, 96)) -> DLKAFormer:
    """NIH Pancreas config (d_lka_net_synapse.py:28-29: 96³ inputs by
    default, patch (2,2,2) → stages 48³/24³/12³/6³; img_size is a
    parameter exactly as D_LKA_Net's)."""
    return DLKAFormer(out_channels=num_classes, img_size=tuple(img_size),
                      patch_size=(2, 2, 2), do_ds=do_ds,
                      trans_block=trans_block, deterministic=deterministic)
