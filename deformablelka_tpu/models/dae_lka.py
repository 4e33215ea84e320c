"""DAELKAFormer — DAEFormer dual-attention encoder + LKA decoder.

Parity target (re-derived):
  /root/reference/2D/networks/DAEEncoder_LKADecoder.py
    MiT 3-stage encoder (:370-434; dims [128,320,512], layers [2,2,2],
    DualTransformerBlock = efficient + channel attention) — identical to
    DAEFormer's encoder, reused from models/daeformer.MiT3.
    DAELKAFormer (:572-634): decoder_2 = bare PatchExpand on the /16
    512-ch feature; decoder_1/decoder_0 = linear + additive skip + 2x
    LKABlock + PatchExpand (FinalPatchExpand_X4 + 1x1 head on the last)
    — the same LKA decoder family as MaxViT_LKA_Decoder, reused from
    models/maxvit_dlka.DecoderLayer (deformable=False).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from deformablelka_tpu.models.daeformer import MiT3
from deformablelka_tpu.models.maxvit_dlka import DecoderLayer


class DAELKAFormer(nn.Module):
    """Input (B,H,W,1|3) -> logits (B,H,W,num_classes)."""
    num_classes: int = 9
    head_count: int = 1
    token_mlp: str = "mix_skip"
    dims: Sequence[int] = (128, 320, 512)
    layers: Sequence[int] = (2, 2, 2)
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        e0, e1, e2 = MiT3(self.dims, self.layers, self.head_count,
                          self.token_mlp, name="backbone")(x)
        det = self.deterministic
        d0, d1, d2 = self.dims
        t2 = DecoderLayer(out_dim=d2, n_class=self.num_classes,
                          deterministic=det, deformable=False,
                          name="decoder_2")(e2)
        t1 = DecoderLayer(out_dim=d1, n_class=self.num_classes,
                          deterministic=det, deformable=False,
                          name="decoder_1")(t2, e1)
        t0 = DecoderLayer(out_dim=d0, n_class=self.num_classes,
                          is_last=True, deterministic=det, deformable=False,
                          name="decoder_0")(t1, e0)
        return t0
