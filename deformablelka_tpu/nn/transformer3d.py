"""3D transformer block wrappers + variant registry.

See deformablelka_tpu/nn/blocks3d.py for the inner attention/gate modules
and the reference citations. Every block here follows the shared skeleton
of transformerblock.py:52-65 and its SE variant (:1402-1419):

    tokens = flatten(x)                      # (B, N, C), row-major s1,s2,s3
    tokens += pos_embed                      # optional learned
    attn = tokens + gamma * inner(norm(tokens))
    y = unflatten(attn)
    out = y + conv8(conv51(y))               # UnetResBlock + drop/1×1

Blocks take and return channels-last volumes (B, S1, S2, S3, C).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import flax.linen as nn

from deformablelka_tpu.nn import blocks3d as B3
from deformablelka_tpu.nn.layers import Conv3d, Linear
from deformablelka_tpu.nn.norms import LayerNorm
from deformablelka_tpu.nn.dynunet import UnetResBlock


class _SkeletonBlock(nn.Module):
    """Common wrapper. `inner_kind` selects the attention/gating module and
    how it consumes tokens vs volumes."""
    input_size: int
    hidden_size: int
    proj_size: int
    num_heads: int = 4
    dropout_rate: float = 0.0
    pos_embed: bool = True
    inner_kind: str = "epa"
    deterministic: bool = True

    def _inner(self, tokens, vol_shape):
        """tokens: (B, N, C). Returns (B, N, C)."""
        B, N, C = tokens.shape
        _, S1, S2, S3, _ = vol_shape
        det = self.deterministic
        kind = self.inner_kind

        def to_vol(t):
            return t.reshape(B, S1, S2, S3, C)

        def to_tok(v):
            return v.reshape(B, N, C)

        if kind == "epa":
            return B3.EPA(input_size=self.input_size, proj_size=self.proj_size,
                          num_heads=self.num_heads,
                          dropout_rate=self.dropout_rate, deterministic=det,
                          name="epa_block")(tokens)
        if kind == "ea":
            return B3.EfficientAttention(num_heads=self.num_heads,
                                         name="epa_block")(tokens)
        if kind in ("lka", "lka_deform", "lka_deform_acdc", "lka_conv"):
            gate = {"lka": B3.LKA3d, "lka_deform": B3.LKA3dDeform,
                    "lka_deform_acdc": B3.LKA3dDeformACDC,
                    "lka_conv": B3.LKA3dConv}[kind]
            out = B3.GatedAttention3d(gate=gate, name="epa_block")(
                to_vol(tokens))
            return to_tok(out)
        if kind == "lka_2dslice":
            out = B3.SliceDeformableLKA2d(name="epa_block")(to_vol(tokens))
            return to_tok(out)
        if kind in ("lka_spatial", "deform_lka_spatial"):
            gate = B3.LKA3d if kind == "lka_spatial" else B3.LKA3dDeform
            x_sa = B3.SpatialOnlyAttention(
                input_size=self.input_size, proj_size=self.proj_size,
                num_heads=self.num_heads, dropout_rate=self.dropout_rate,
                deterministic=det, name="attn")(tokens)
            x_lka = to_tok(B3.GatedAttention3d(gate=gate, name="lka")(
                to_vol(tokens)))
            # Fusion order per transformerblock.py:855-861 / 2146-2150:
            # concat(out_proj2(attention), out_proj(lka)).
            x_lka = Linear(C // 2, name="out_proj")(x_lka)
            x_sa = Linear(C // 2, name="out_proj2")(x_sa)
            return jnp.concatenate([x_sa, x_lka], axis=-1)
        if kind in ("lka_channel", "deform_lka_channel"):
            gate = B3.LKA3d if kind == "lka_channel" else B3.LKA3dDeform
            x_ca = B3.ChannelOnlyAttention(
                num_heads=self.num_heads, dropout_rate=self.dropout_rate,
                deterministic=det, name="attn")(tokens)
            x_lka = to_tok(B3.GatedAttention3d(gate=gate, name="lka")(
                to_vol(tokens)))
            # transformerblock.py:1030-1036: concat(out_proj2(lka),
            # out_proj(channel-attn)).
            x_ca = Linear(C // 2, name="out_proj")(x_ca)
            x_lka = Linear(C // 2, name="out_proj2")(x_lka)
            return jnp.concatenate([x_lka, x_ca], axis=-1)
        if kind == "lka_channel_norm":
            x_ca = B3.ChannelOnlyAttention(
                num_heads=self.num_heads, dropout_rate=self.dropout_rate,
                deterministic=det, name="attn")(tokens)
            x_lka = to_tok(B3.GatedAttention3d(gate=B3.LKA3d, name="lka")(
                to_vol(tokens)))
            t2 = self.param("temperature2", nn.initializers.ones, (1, 1, 1))
            x_lka = x_lka * t2[0]
            x_ca = Linear(C // 2, name="out_proj")(
                LayerNorm(name="fuse_norm")(x_ca))
            x_lka = Linear(C // 2, name="out_proj2")(
                LayerNorm(name="fuse_norm2")(x_lka))
            return jnp.concatenate([x_lka, x_ca], axis=-1)
        if kind == "deform_lka_channel_seq":
            x_ca = B3.ChannelOnlyAttention(
                num_heads=self.num_heads, dropout_rate=0.0,
                deterministic=True, name="attn")(tokens)
            x_ca = LayerNorm(name="fuse_norm")(x_ca)
            out = B3.GatedAttention3d(gate=B3.LKA3dDeformSizeAware,
                                      name="lka")(to_vol(x_ca))
            out = to_tok(out)
            out = LayerNorm(name="fuse_norm2")(out)
            return Linear(C, name="out_proj")(out)
        if kind == "deform_lka_spatial_seq":
            x_sa = B3.SpatialOnlyAttention(
                input_size=self.input_size, proj_size=self.proj_size,
                num_heads=self.num_heads, dropout_rate=0.0,
                deterministic=True, name="attn")(tokens)
            x_sa = LayerNorm(name="fuse_norm")(x_sa)
            out = B3.GatedAttention3d(gate=B3.LKA3dDeformSizeAware,
                                      name="lka")(to_vol(x_sa))
            out = to_tok(out)
            out = LayerNorm(name="fuse_norm2")(out)
            return Linear(C, name="out_proj")(out)
        raise ValueError(f"unknown inner kind {kind}")

    @nn.compact
    def __call__(self, x):
        B, S1, S2, S3, C = x.shape
        N = S1 * S2 * S3
        tokens = x.reshape(B, N, C)
        if self.pos_embed:
            pe = self.param("pos_embed", nn.initializers.zeros,
                            (1, self.input_size, self.hidden_size))
            tokens = tokens + pe

        se = self.inner_kind == "se_lka"
        if se:
            # TransformerBlock_SE (:1402-1419): SE gate BEFORE the norm.
            vol = tokens.reshape(B, S1, S2, S3, C)
            rd = int(C * 0.25)
            s = jnp.mean(vol, axis=(1, 2, 3), keepdims=True)
            s = Conv3d(rd, 1, use_bias=True, name="se_fc1")(s)
            s = nn.relu(s)
            s = Conv3d(C, 1, use_bias=True, name="se_fc2")(s)
            vol = vol * nn.sigmoid(s)
            tokens = vol.reshape(B, N, C)

        gamma = self.param("gamma", nn.initializers.constant(1e-6), (C,))
        normed = LayerNorm(name="norm")(tokens)
        if se:
            inner = self._se_inner(normed, x.shape)
        else:
            inner = self._inner(normed, x.shape)
        attn = tokens + gamma * inner

        y = attn.reshape(B, S1, S2, S3, C)
        z = UnetResBlock(3, C, kernel_size=3, stride=1, norm_name="batch",
                         train=not self.deterministic, name="conv51")(y)
        z = nn.Dropout(0.1, deterministic=self.deterministic,
                       broadcast_dims=(1, 2, 3))(z)
        z = Conv3d(C, 1, use_bias=True, name="conv8")(z)
        return y + z

    def _se_inner(self, tokens, vol_shape):
        B, N, C = tokens.shape
        _, S1, S2, S3, _ = vol_shape
        out = B3.GatedAttention3d(gate=B3.LKA3d, name="LKA_block")(
            tokens.reshape(B, S1, S2, S3, C))
        return out.reshape(B, N, C)


def _make(kind):
    class _Block(_SkeletonBlock):
        inner_kind: str = kind
    _Block.__name__ = kind
    return _Block


# Registry mirroring the reference's --trans_block CLI axis
# (run_training.py:124-129 resolves names in transformerblock.py).
TRANSFORMER_BLOCKS = {
    "TransformerBlock": _make("epa"),
    "TransformerBlock_EA": _make("ea"),
    "TransformerBlock_3D_LKA": _make("lka"),
    "TransformerBlock_2Dsingle": _make("lka_2dslice"),
    "TransformerBlock_3D_single_deform_LKA": _make("lka_deform"),
    # the ACDC file's class of the same name differs: dim-dependent
    # anisotropic kernels (acdc/transformerblock.py:211-252);
    # models.dlka_former_acdc maps the CLI name onto this variant
    "TransformerBlock_3D_single_deform_LKA_acdc": _make("lka_deform_acdc"),
    "TransformerBlock_3D_LKA_3D_conv": _make("lka_conv"),
    "TransformerBlock_LKA_Spatial": _make("lka_spatial"),
    "TransformerBlock_LKA_Channel": _make("lka_channel"),
    "TransformerBlock_LKA_Channel_norm": _make("lka_channel_norm"),
    "TransformerBlock_SE": _make("se_lka"),
    "TransformerBlock_Deform_LKA_Channel": _make("deform_lka_channel"),
    "TransformerBlock_Deform_LKA_Channel_sequential": _make("deform_lka_channel_seq"),
    "TransformerBlock_Deform_LKA_Spatial": _make("deform_lka_spatial"),
    "TransformerBlock_Deform_LKA_Spatial_sequential": _make("deform_lka_spatial_seq"),
}
