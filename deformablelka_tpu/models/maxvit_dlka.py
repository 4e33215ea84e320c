"""2D D-LKA Net — MaxViT encoder + deformable-LKA decoder (NHWC).

Parity targets:
  /root/reference/2D/networks/MaxViT_deform_LKA.py:634-696
    MaxViT_deformableLKAFormer: MaxViT4Out_Small backbone (grayscale input
    repeated to 3 channels, :683-684), 4 decoder stages with dims
    (768, 384, 192, 96) at 7/14/28/56; bottom decoder is PatchExpand only
    (:618-620), others: linear + additive skip + 2× deformableLKABlock +
    PatchExpand (:600-617); final ×4 expand + 1×1 class head (:574-577).
  PatchExpand (:488-513): Linear(dim→2dim, no bias) + 2×2 pixel shuffle +
    LayerNorm(dim/2). FinalPatchExpand_X4 (:516-542): Linear(dim→16dim,
    no bias) + 4×4 shuffle + LayerNorm(dim).
  Skin variant: 2D/skin_code/model/MaxViT_LKA_Decoder.py (num_classes=1).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from deformablelka_tpu.models.maxvit import MaxViT4Out
from deformablelka_tpu.nn.layers import Conv2d, Linear
from deformablelka_tpu.nn.norms import LayerNorm, BatchNorm
from deformablelka_tpu.nn.lka2d import LKABlock, deformableLKABlock


class PatchExpand(nn.Module):
    """×2 pixel-shuffle upsample on NHWC maps."""

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = Linear(2 * C, use_bias=False, name="expand")(x)
        x = x.reshape(B, H, W, 2, 2, C // 2)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, C // 2)
        return LayerNorm(name="norm")(x)


class FinalPatchExpand_X4(nn.Module):
    """×4 pixel-shuffle upsample keeping the channel count.

    `subpixel_out=True` returns the PRE-shuffle (B, H, W, 16, C) form
    after the LayerNorm. Exactly equivalent params and math: the LN
    normalises each OUTPUT pixel over its C channels, and every
    (h, w, s) row of the subpixel form IS one output pixel — so a
    caller can run the 1×1 class head at H×W and shuffle the n_class
    channels instead of C (the full-res C-channel transpose is the
    expensive part of the tail; see DecoderLayer)."""
    subpixel_out: bool = False

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = Linear(16 * C, use_bias=False, name="expand")(x)
        if self.subpixel_out:
            x = x.reshape(B, H, W, 16, C)
            return LayerNorm(name="norm")(x)
        x = x.reshape(B, H, W, 4, 4, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, 4 * H, 4 * W, C)
        return LayerNorm(name="norm")(x)


class DecoderLayer(nn.Module):
    """MyDecoderLayer (MaxViT_deform_LKA.py:545-620) on NHWC maps.

    `reuse_first_lka` reproduces a reference quirk: every NON-deform
    LKA-decoder file applies `layer_lka_1` TWICE ("LEON CHANGE THIS!",
    MaxViT_LKA_Decoder.py:612, DAEEncoder_LKADecoder.py:561,
    DAT_LKA_Decoder.py:559, mvit_LKA_Decoder.py:559,
    STViTEncoder_LKADecoder.py:1101), leaving `layer_lka_2`'s params
    dead (we don't materialise them, like decoder_3's dead x1_linear).
    Only the deform flagship (MaxViT_deform_LKA.py:612) and the skin
    copy (skin_code/model/MaxViT_LKA_Decoder.py:559) use layer_lka_2.
    Default None → follow the reference: reuse iff not deformable;
    skin builders pass False explicitly."""
    out_dim: int
    n_class: int = 9
    is_last: bool = False
    drop_path: float = 0.0
    deterministic: bool = True
    deformable: bool = True
    reuse_first_lka: bool | None = None

    @nn.compact
    def __call__(self, x1, x2=None):
        # deformable=False → the paper's "LKA Baseline"
        # (2D/networks/MaxViT_LKA_Decoder.py: LKABlock decoder).
        block = deformableLKABlock if self.deformable else LKABlock
        reuse = (not self.deformable if self.reuse_first_lka is None
                 else self.reuse_first_lka)
        if x2 is not None:
            x = Linear(self.out_dim, name="x1_linear")(x1)
            x = x + x2
            lka_1 = block(drop_path=self.drop_path,
                          deterministic=self.deterministic,
                          name="layer_lka_1")
            x = lka_1(x)
            if reuse:
                x = lka_1(x)
            else:
                x = block(drop_path=self.drop_path,
                          deterministic=self.deterministic,
                          name="layer_lka_2")(x)
            if self.is_last:
                import os as _os
                if _os.environ.get("DLKA_TAIL_SUBPIXEL", "1") == "1":
                    # Subpixel-form tail: expand+LN+head all at H×W,
                    # shuffle the n_class channels last. Bit-equivalent
                    # (the 1×1 head is position-independent; LN rows
                    # map 1:1 to output pixels — FinalPatchExpand_X4
                    # docstring) but skips the (4H, 4W, C) transpose
                    # materialisation. Trace-time knob like the other
                    # DLKA_* switches; default ON after the TPU
                    # model-level gate (5.93 → 5.84 ms/fwd, both
                    # passes, PERF.md round-5 2D entry).
                    y = FinalPatchExpand_X4(name="layer_up",
                                            subpixel_out=True)(x)
                    B, H, W, S, C = y.shape
                    y = Conv2d(self.n_class, 1, use_bias=True,
                               name="last_layer")(
                        y.reshape(B, H, W * S, C))
                    y = y.reshape(B, H, W, 4, 4, self.n_class)
                    x = y.transpose(0, 1, 3, 2, 4, 5).reshape(
                        B, 4 * H, 4 * W, self.n_class)
                    return x
                x = FinalPatchExpand_X4(name="layer_up")(x)
                x = Conv2d(self.n_class, 1, use_bias=True,
                           name="last_layer")(x)
            else:
                x = PatchExpand(name="layer_up")(x)
            return x
        return PatchExpand(name="layer_up")(x1)


class MaxViTDeformableLKAFormer(nn.Module):
    """The 2D flagship. Input (B, H, W, 1|3) → logits (B, H, W, n_class).

    deformable=False gives the paper's "LKA Baseline"
    (MaxViTLKAFormer, 2D/networks/MaxViT_LKA_Decoder.py — plain LKABlock
    decoder, 85.82M params vs 101.64M)."""
    num_classes: int = 9
    img_size: int = 224
    deterministic: bool = True
    deformable: bool = True

    @nn.compact
    def __call__(self, x):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        feats = MaxViT4Out(img_size=self.img_size, name="backbone")(x)
        e0, e1, e2, e3 = feats  # 96@/4, 192@/8, 384@/16, 768@/32

        det = self.deterministic
        dfm = self.deformable
        t3 = DecoderLayer(out_dim=768, n_class=self.num_classes,
                          deterministic=det, deformable=dfm,
                          name="decoder_3")(e3)
        t2 = DecoderLayer(out_dim=384, n_class=self.num_classes,
                          deterministic=det, deformable=dfm,
                          name="decoder_2")(t3, e2)
        t1 = DecoderLayer(out_dim=192, n_class=self.num_classes,
                          deterministic=det, deformable=dfm,
                          name="decoder_1")(t2, e1)
        t0 = DecoderLayer(out_dim=96, n_class=self.num_classes, is_last=True,
                          deterministic=det, deformable=dfm,
                          name="decoder_0")(t1, e0)
        return t0


def maxvit_lka_former(num_classes: int = 9, img_size: int = 224,
                      deterministic: bool = True) -> MaxViTDeformableLKAFormer:
    """The non-deformable "LKA Baseline" (MaxViT_LKA_Decoder.py)."""
    return MaxViTDeformableLKAFormer(num_classes=num_classes,
                                     img_size=img_size,
                                     deterministic=deterministic,
                                     deformable=False)
