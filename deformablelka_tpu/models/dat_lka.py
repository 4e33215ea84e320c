"""DAT-LKA: Deformable-Attention-Transformer encoder + LKA decoder.

Parity targets (re-derived, not translated):
  /root/reference/2D/networks/DAT/dat_4out.py:91-245 — DAT encoder as
    configured by DATLKAFormer: 4×4 conv stem + channel LN, dims
    (96,192,384,768), depths (2,2,18,2), stage specs
    ('LS','LS',('LD')×9,'LD'), 2×2 strided down-projections, per-stage
    attention type mix:
      'L' LocalAttention (dat_blocks.py:18-89): 7×7 window MHSA with a
          Swin-style relative-position bias table;
      'S' ShiftWindowAttention (:91-126): same, rolled by
          ceil(ws/2)=4 (NOT Swin's floor) with the standard block mask;
      'D' DAttentionBaseline (:128-293): per-group offsets from a
          depthwise conv + channel-LN + GELU + 1×1 (tanh-bounded by
          offset_range_factor=2/Hk), reference grid in [-1,1], K/V
          bilinearly sampled (align_corners=True) at the offset grid,
          dense queries vs n_sample keys, plus a continuous relative
          position bias: the (heads, 2H-1, 2W-1) rpe_table sampled at
          the query→sample displacement (use_pe=True on stages 2,3).
  /root/reference/2D/networks/DAT_LKA_Decoder.py:492-660 — decoder =
    MyDecoderLayer chain; its forward uses additive skip fusion
    (cross_attn/concat_linear are dead, :552-554) and applies
    layer_lka_1 TWICE (:556-559, layer_former_*/layer_lka_2 dead) —
    exactly the LKA-baseline DecoderLayer already modeled in
    models/maxvit_dlka.py (reuse_first_lka).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from deformablelka_tpu.nn.layers import Conv2d, Linear, gelu
from deformablelka_tpu.nn.norms import LayerNorm
from deformablelka_tpu.ops.deform2d import grid_sample_bilinear
from deformablelka_tpu.models.maxvit_dlka import DecoderLayer


def _rel_pos_index(ws: int) -> np.ndarray:
    """Swin relative_position_index for a ws×ws window (static)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # (ws², ws²)


def _shift_attn_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """ShiftWindowAttention mask (dat_blocks.py:100-117), static."""
    img = np.zeros((H, W))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    r1, r2 = H // ws, W // ws
    wins = img.reshape(r1, ws, r2, ws).transpose(0, 2, 1, 3)
    wins = wins.reshape(r1 * r2, ws * ws)
    mask = wins[:, None, :] - wins[:, :, None]
    return np.where(mask != 0, -100.0, 0.0)  # (nW, ws², ws²)


class LocalAttentionDAT(nn.Module):
    """LocalAttention / ShiftWindowAttention (dat_blocks.py:18-126),
    NHWC. shift>0 → rolled windows with the block attention mask."""
    dim: int
    heads: int
    window_size: int = 7
    shift: int = 0

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        ws = self.window_size
        h = self.heads
        hc = C // h
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.01),
            ((2 * ws - 1) * (2 * ws - 1), h))
        if self.shift:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
        r1, r2 = H // ws, W // ws
        win = x.reshape(B, r1, ws, r2, ws, C).transpose(0, 1, 3, 2, 4, 5)
        win = win.reshape(B * r1 * r2, ws * ws, C)
        qkv = Linear(3 * C, name="proj_qkv")(win)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q * hc ** -0.5
        q, k, v = (t.reshape(-1, ws * ws, h, hc).transpose(0, 2, 1, 3)
                   for t in (q, k, v))
        attn = jnp.einsum("bhmc,bhnc->bhmn", q, k)
        idx = _rel_pos_index(ws)
        bias = table[idx.reshape(-1)].reshape(ws * ws, ws * ws, h)
        attn = attn + bias.transpose(2, 0, 1)[None]
        if self.shift:
            mask = jnp.asarray(_shift_attn_mask(H, W, ws, self.shift),
                               attn.dtype)
            nW = mask.shape[0]
            attn = attn.reshape(B, nW, h, ws * ws, ws * ws)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(B * nW, h, ws * ws, ws * ws)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhmn,bhnc->bhmc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(-1, ws * ws, C)
        out = Linear(C, name="proj_out")(out)
        out = out.reshape(B, r1, r2, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(B, H, W, C)
        if self.shift:
            out = jnp.roll(out, (self.shift, self.shift), axis=(1, 2))
        return out


class DAttention(nn.Module):
    """DAttentionBaseline (dat_blocks.py:128-293), NHWC maps.

    use_pe adds the continuous rel-pos bias: rpe_table (heads, 2H-1,
    2W-1) grid-sampled at (q_grid - pos)·0.5 with align_corners=True."""
    dim: int
    n_heads: int
    n_groups: int
    stage_idx: int
    offset_range_factor: float = 2.0
    use_pe: bool = True
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        g = self.n_groups
        cg = C // g
        kk = [9, 7, 5, 3][self.stage_idx]

        q = Conv2d(C, (1, 1), name="proj_q")(x)
        # per-group offset net: dw conv kk + LN + GELU + 1×1 → 2
        q_off = q.reshape(B, H, W, g, cg).transpose(0, 3, 1, 2, 4)
        q_off = q_off.reshape(B * g, H, W, cg)
        o = Conv2d(cg, (kk, kk), stride=self.stride, padding=kk // 2,
                   groups=cg, name="offset_dw")(q_off)
        o = gelu(LayerNorm(name="offset_norm")(o))
        offset = Conv2d(2, (1, 1), use_bias=False, name="offset_proj")(o)
        Hk, Wk = offset.shape[1:3]
        if self.offset_range_factor > 0:
            rng = jnp.asarray([1.0 / Hk, 1.0 / Wk], offset.dtype)
            offset = jnp.tanh(offset) * rng * self.offset_range_factor
        # reference grid in [-1, 1] (y, x), dat_blocks._get_ref_points
        ry = (jnp.arange(Hk) + 0.5) / Hk * 2 - 1
        rx = (jnp.arange(Wk) + 0.5) / Wk * 2 - 1
        ref = jnp.stack(jnp.meshgrid(ry, rx, indexing="ij"), -1)
        if self.offset_range_factor >= 0:
            pos = offset + ref[None]
        else:
            pos = jnp.tanh(offset + ref[None])
        # grid_sample expects (x, y)
        grid = jnp.stack([pos[..., 1], pos[..., 0]], -1)
        xs = x.reshape(B, H, W, g, cg).transpose(0, 3, 1, 2, 4)
        xs = xs.reshape(B * g, H, W, cg)
        sampled = grid_sample_bilinear(xs, grid)  # (B·g, Hk, Wk, cg)
        ns = Hk * Wk
        sampled = sampled.reshape(B, g, ns, cg)
        sampled = sampled.transpose(0, 2, 1, 3).reshape(B, ns, C)

        k = Linear(C, name="proj_k")(sampled)
        v = Linear(C, name="proj_v")(sampled)
        h = self.n_heads
        hc = C // h
        qh = q.reshape(B, H * W, h, hc)
        kh = k.reshape(B, ns, h, hc)
        vh = v.reshape(B, ns, h, hc)
        attn = jnp.einsum("bnhc,bmhc->bhnm", qh, kh) * hc ** -0.5
        if self.use_pe:
            rpe = self.param("rpe_table",
                             nn.initializers.truncated_normal(0.01),
                             (h, 2 * H - 1, 2 * W - 1))
            gh = h // g
            qy = (jnp.arange(H) + 0.5) / H * 2 - 1
            qx = (jnp.arange(W) + 0.5) / W * 2 - 1
            q_grid = jnp.stack(jnp.meshgrid(qy, qx, indexing="ij"), -1)
            q_grid = q_grid.reshape(H * W, 2)
            disp = (q_grid[None, :, None, :]
                    - pos.reshape(B * g, 1, ns, 2)) * 0.5
            disp = jnp.stack([disp[..., 1], disp[..., 0]], -1)
            rpe_maps = jnp.broadcast_to(
                rpe.reshape(1, g, gh, 2 * H - 1, 2 * W - 1),
                (B, g, gh, 2 * H - 1, 2 * W - 1))
            rpe_maps = rpe_maps.reshape(B * g, gh, 2 * H - 1, 2 * W - 1)
            rpe_maps = rpe_maps.transpose(0, 2, 3, 1)  # NHWC
            bias = grid_sample_bilinear(rpe_maps, disp)  # (B·g, HW, ns, gh)
            bias = bias.transpose(0, 3, 1, 2).reshape(B, h, H * W, ns)
            attn = attn + bias
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhc->bnhc", attn, vh).reshape(B, H, W, C)
        return Conv2d(C, (1, 1), name="proj_out")(out)


class TokenMLP(nn.Module):
    """TransformerMLP (dat_blocks.py:296-317): linear1 → GELU →
    linear2 on tokens."""
    dim: int
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        m = Linear(self.dim * self.expansion, name="linear1")(x)
        return Linear(self.dim, name="linear2")(gelu(m))


class DATStage(nn.Module):
    """TransformerStage (dat_4out.py:21-90): `depths` blocks of pre-LN
    residual attention + pre-LN residual token MLP. `proj` is Identity
    at this config (dims[i-1]·2 == dims[i])."""
    dim: int
    n_heads: int
    spec: str  # string of 'L' / 'S' / 'D' per block
    n_groups: int
    stage_idx: int
    use_pe: bool = False
    offset_range_factor: float = 2.0
    window_size: int = 7
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        for d, spec in enumerate(self.spec):
            n = LayerNorm(name=f"layer_norms_{2 * d}")(x)
            if spec == "L":
                a = LocalAttentionDAT(self.dim, self.n_heads,
                                      self.window_size,
                                      name=f"attns_{d}")(n)
            elif spec == "S":
                shift = -(-self.window_size // 2)  # ceil, dat_4out.py:64
                a = LocalAttentionDAT(self.dim, self.n_heads,
                                      self.window_size, shift=shift,
                                      name=f"attns_{d}")(n)
            else:
                a = DAttention(self.dim, self.n_heads, self.n_groups,
                               self.stage_idx, self.offset_range_factor,
                               self.use_pe, name=f"attns_{d}")(n)
            x = x + a
            n = LayerNorm(name=f"layer_norms_{2 * d + 1}")(x)
            x = x + TokenMLP(self.dim, self.expansion,
                             name=f"mlps_{d}")(n)
        return x


class DATEncoder(nn.Module):
    """DAT (dat_4out.py:91-245) at DATLKAFormer's config."""
    dims: Sequence[int] = (96, 192, 384, 768)
    depths: Sequence[int] = (2, 2, 18, 2)
    heads: Sequence[int] = (3, 6, 12, 24)
    groups: Sequence[int] = (-1, -1, 3, 6)
    stage_spec: Sequence = ("LS", "LS", "LD" * 9, "LD")
    use_pes: Sequence[bool] = (False, False, True, True)
    offset_range: Sequence[float] = (-1.0, -1.0, 2.0, 2.0)

    @nn.compact
    def __call__(self, x):
        h = Conv2d(self.dims[0], (4, 4), stride=4, padding=0,
                   name="patch_proj")(x)
        h = LayerNorm(name="patch_norm")(h)
        outs = []
        for s in range(4):
            h = DATStage(self.dims[s], self.heads[s],
                         self.stage_spec[s][:self.depths[s]],
                         self.groups[s], s, self.use_pes[s],
                         self.offset_range[s], name=f"stages_{s}")(h)
            outs.append(h)
            if s < 3:
                h = Conv2d(self.dims[s + 1], (2, 2), stride=2, padding=0,
                           use_bias=False, name=f"down_projs_{s}")(h)
                h = LayerNorm(name=f"down_norm_{s}")(h)
        return outs


class DATLKAFormer(nn.Module):
    """DAT_LKA_Decoder.py DATLKAFormer. (B,H,W,1|3) → (B,H,W,n_class).

    Decoder = the LKA-baseline DecoderLayer (additive skip fusion,
    layer_lka_1 applied twice — see module docstring)."""
    num_classes: int = 9
    dims: Sequence[int] = (96, 192, 384, 768)
    depths: Sequence[int] = (2, 2, 18, 2)
    heads: Sequence[int] = (3, 6, 12, 24)
    groups: Sequence[int] = (-1, -1, 3, 6)
    stage_spec: Sequence = ("LS", "LS", "LD" * 9, "LD")
    use_pes: Sequence[bool] = (False, False, True, True)
    offset_range: Sequence[float] = (-1.0, -1.0, 2.0, 2.0)

    @nn.compact
    def __call__(self, x):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        e0, e1, e2, e3 = DATEncoder(self.dims, self.depths, self.heads,
                                    self.groups, self.stage_spec,
                                    self.use_pes, self.offset_range,
                                    name="backbone")(x)
        t3 = DecoderLayer(out_dim=self.dims[3], n_class=self.num_classes,
                          deformable=False, name="decoder_3")(e3)
        t2 = DecoderLayer(out_dim=self.dims[2], n_class=self.num_classes,
                          deformable=False, name="decoder_2")(t3, e2)
        t1 = DecoderLayer(out_dim=self.dims[1], n_class=self.num_classes,
                          deformable=False, name="decoder_1")(t2, e1)
        t0 = DecoderLayer(out_dim=self.dims[0], n_class=self.num_classes,
                          deformable=False, is_last=True,
                          name="decoder_0")(t1, e0)
        return t0
