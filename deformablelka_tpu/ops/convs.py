"""Channels-last convolution helpers built on `lax.conv_general_dilated`.

Weight layouts (lax defaults for channels-last):
  2D: (kh, kw, cin_per_group, cout)        — "HWIO"
  3D: (kd, kh, kw, cin_per_group, cout)    — "DHWIO"

These map onto the TPU MXU via XLA's convolution emitter; depthwise convs
use `feature_group_count == channels`.

Reference semantics being reproduced (cited for parity checks):
  /root/reference/3D/d_lka_former/network_architecture/dynunet_block.py:251-277
  (padding = (k - s + 1) // 2, transposed output_padding = 2p + s - k).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax


def _tuple(v, n: int) -> tuple:
    if isinstance(v, (tuple, list)):
        assert len(v) == n
        return tuple(v)
    return (v,) * n


def same_padding(kernel_size, stride, dilation=1, ndim: int | None = None):
    """Torch-style symmetric padding `(k_eff - s + 1) // 2` per spatial dim.

    Matches MONAI's `get_padding` (dynunet_block.py:251-262) for stride 1 or 2
    and odd kernels. Returns a list of (lo, hi) pairs for lax.
    """
    if ndim is None:
        ndim = len(kernel_size) if isinstance(kernel_size, (tuple, list)) else 1
    ks = _tuple(kernel_size, ndim)
    st = _tuple(stride, ndim)
    dil = _tuple(dilation, ndim)
    pads = []
    for k, s, d in zip(ks, st, dil):
        k_eff = d * (k - 1) + 1
        p = (k_eff - s + 1) // 2
        if p < 0:
            raise ValueError("negative padding; adjust kernel/stride")
        pads.append((p, p))
    return pads


def conv2d(x, w, *, stride=1, padding="same", dilation=1, groups: int = 1,
           bias=None, precision=None):
    """2D conv, x: (B, H, W, Cin), w: (kh, kw, Cin//groups, Cout)."""
    st = _tuple(stride, 2)
    dil = _tuple(dilation, 2)
    if padding == "same":
        padding = same_padding(w.shape[:2], st, dil, ndim=2)
    elif isinstance(padding, int):
        padding = [(padding, padding)] * 2
    elif isinstance(padding, (tuple, list)) and padding and isinstance(padding[0], int):
        padding = [(p, p) for p in padding]
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=st, padding=padding,
        rhs_dilation=dil, feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _conv3d_im2col(x, w, padding, bias):
    """Dense 3³ stride-1 conv as 27 static shifts + ONE MXU GEMM.

    On this TPU backend XLA's conv emitter runs ~2× slower than an
    explicit im2col matmul at the model's channel widths (measured:
    917→433 ms at full-res C=16, 196→96 ms at C=64). Only used for
    kernel 3³, stride 1, dilation 1, symmetric padding 1, groups 1.
    """
    B, D, H, W, C = x.shape
    Co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), padding[0], padding[1], padding[2], (0, 0)))
    cols = []
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                cols.append(lax.slice(xp, (0, dz, dy, dx, 0),
                                      (B, dz + D, dy + H, dx + W, C)))
    col = jnp.concatenate(cols, axis=-1)
    out = jnp.dot(col.reshape(B * D * H * W, 27 * C),
                  w.astype(x.dtype).reshape(27 * C, Co),
                  preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).reshape(B, D, H, W, Co)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def s2d_pack(x):
    """Space-to-depth pack: (B, D, H, W, C) → (B, D/2, H/2, W/2, 8C)
    with lane layout (e, c), e = (ez·2+ey)·2+ex the intra-cell corner.
    Requires even D/H/W."""
    B, D, H, W, C = x.shape
    X = x.reshape(B, D // 2, 2, H // 2, 2, W // 2, 2, C)
    return X.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        B, D // 2, H // 2, W // 2, 8 * C)


def s2d_unpack(X, C):
    """Inverse of `s2d_pack` (C = the ORIGINAL channel count)."""
    B, Dc, Hc, Wc, _ = X.shape
    y = X.reshape(B, Dc, Hc, Wc, 2, 2, 2, C)
    return y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
        B, 2 * Dc, 2 * Hc, 2 * Wc, C)


def _s2d_weight(w):
    """Scatter a 3³ dense kernel (3,3,3,C,Co) to the s2d-space kernel
    W'[q+1, (e,c), (d,o)] = w[k, c, o] with d + k - 1 = 2q + e per
    axis, as ONE einsum with a constant per-axis one-hot
    A[k,d,q,e] = 1 iff d + k - 1 = 2(q-1) + e. (The previous 216
    `.at[].set()` scatters ran ON DEVICE every forward — w is a traced
    param — and owned ~4 ms of each full-res UnetResBlock; measured
    2026-08-19.)"""
    import numpy as _np
    C, Co = w.shape[-2], w.shape[-1]
    A = _np.zeros((3, 2, 3, 2), w.dtype)
    for k in range(3):
        for d in range(2):
            t = d + k - 1
            A[k, d, (t >> 1) + 1, t & 1] = 1
    A = jnp.asarray(A)
    # w: (kz,ky,kx,c,o) ⊗ Az[kz,dz,qz,ez] Ay[ky,dy,qy,ey] Ax[kx,dx,qx,ex]
    W2 = jnp.einsum("zyxco,zaqe,ybrf,xdsg->qrsefgcabdo", w, A, A, A,
                    preferred_element_type=w.dtype)
    return W2.reshape(3, 3, 3, 8 * C, 8 * Co)


def conv3d_s2d_space(X, w, bias=None):
    """Dense 3³ stride-1 'same' conv on an ALREADY s2d-packed input,
    returning a packed output. Exact incl. zero same-padding
    (out-of-range taps land in the coarse zero-pad ring)."""
    W2 = _s2d_weight(w.astype(X.dtype))
    Y = lax.conv_general_dilated(
        X, W2, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if bias is not None:
        Y = Y + jnp.tile(bias, 8).astype(Y.dtype)
    return Y


def conv1x1_s2d_space(X, w, bias=None):
    """1×1×1 conv on an s2d-packed input (block-diagonal over the 8
    intra-cell corners: out lane (e,o) reads only lanes (e,·))."""
    C, Co = w.shape[-2], w.shape[-1]
    wm = w.reshape(C, Co).astype(X.dtype)
    W2 = jnp.einsum("co,ed->ecdo", wm,
                    jnp.eye(8, dtype=X.dtype)).reshape(8 * C, 8 * Co)
    Y = jnp.dot(X.reshape(-1, 8 * C), W2,
                preferred_element_type=jnp.float32).astype(X.dtype)
    Y = Y.reshape(*X.shape[:-1], 8 * Co)
    if bias is not None:
        Y = Y + jnp.tile(bias, 8).astype(Y.dtype)
    return Y


def instance_norm_s2d_space(X, C, eps=1e-5):
    """Instance norm (affine=False) on an s2d-packed input — stats per
    (sample, original channel c) reduce over (coarse spatial, corner e);
    exactly the normal-space statistics."""
    B = X.shape[0]
    xf = X.astype(jnp.float32).reshape(B, -1, 8, C)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    y = (xf - mean) / jnp.sqrt(var + eps)
    return y.reshape(X.shape).astype(X.dtype)


def _conv3d_s2d(x, w, bias):
    """Dense 3³ stride-1 conv via space-to-depth: exact reformulation as
    a half-resolution 3³ conv with 8×C channels.

    The TPU conv emitter wastes 7/8 of the MXU lanes at the model's
    full-resolution widths (C=1..32, lane width 128). Folding a 2³ cell
    into channels gives C'=8C in/out — 8× the nominal FLOPs but on full
    lanes, which wins whenever the original conv is lane-bound (the
    flagship's full-res UnetResBlock: C_in 1/16, 64×128×128 maps).
    Requires even D/H/W; kernel 3³, stride 1, dilation 1, groups 1.
    """
    B, D, H, W, C = x.shape
    Co = w.shape[-1]
    y = s2d_unpack(conv3d_s2d_space(s2d_pack(x), w.astype(x.dtype)), Co)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv3d(x, w, *, stride=1, padding="same", dilation=1, groups: int = 1,
           bias=None, precision=None):
    """3D conv, x: (B, D, H, W, Cin), w: (kd, kh, kw, Cin//groups, Cout)."""
    st = _tuple(stride, 3)
    dil = _tuple(dilation, 3)
    if padding == "same":
        padding = same_padding(w.shape[:3], st, dil, ndim=3)
    elif isinstance(padding, int):
        padding = [(padding, padding)] * 3
    elif isinstance(padding, (tuple, list)) and padding and isinstance(padding[0], int):
        padding = [(p, p) for p in padding]
    import os
    k = w.shape[0]
    if (dil[0] > 1 and dil == (dil[0],) * 3 and st == (1, 1, 1)
            and groups == x.shape[-1] and w.shape[3] == 1
            and w.shape[:3] == (k, k, k) and k % 2 == 1
            and tuple(padding) == ((dil[0] * (k // 2),) * 2,) * 3):
        dw_impl = os.environ.get("DLKA_DWCONV_IMPL", "lax")
        if dw_impl == "auto":
            # 'auto' == 'lax'. The round-3 snapshot shipped an isolated-
            # probe heuristic here (zdecomp when the dilated extent
            # exceeds the smallest spatial dim: stage-1 16³ 7³d3 lax
            # 1.70 vs zdecomp 0.16 ms ISOLATED) and it cost 40 ms at
            # model level — gate_model_ab 2026-08-19: flagship fwd
            # 104.6 ms with the heuristic vs 64.4 with lax, reproduced
            # twice interleaved. Sixth confirmation that isolated-op
            # wins do not compose; dw dispatch changes must pass the
            # model-level gate.
            dw_impl = "lax"
        if dw_impl == "zdecomp":
            # dilated depthwise with 'same' extent -> per-z-tap 2D
            # convs. Reached only explicitly via
            # DLKA_DWCONV_IMPL=zdecomp (the r3 'auto' heuristic that
            # routed here was reverted — see above). History:
            # 9× faster ISOLATED (85→9 ms at 32×64×64 C=32) but 2×
            # slower in the r1 full flagship forward (580→1187 ms) — the
            # k per-tap conv outputs materialize in HBM. Any default
            # change here must pass benchmarks/gate_model_ab.py (same-
            # session model-level A/B), per PERF.md's repeated finding
            # that isolated-op wins do not compose.
            return _depthwise3d_zdecomp(x, w, dil[0], bias)
        if dw_impl == "atrous":
            return _depthwise3d_atrous(x, w, dil[0], bias)
        if dw_impl == "pallas":
            # Hand Pallas stencil (ops/pallas/dwconv3d_kernel):
            # exact-f32 per-tap VPU accumulation over à-trous phases.
            # Measured SLOWER than the lax emitter in the 2026-08-17
            # session (K7d3 stage-1: 25.9 vs 6.8 ms) — but exact where
            # DEFAULT-precision lax is bf16-ish (~2e-3 rel error at
            # C=32 large shapes, PERF.md). Opt-in / insurance against
            # the 85 ms emitter sessions.
            from deformablelka_tpu.ops.pallas.dwconv3d_kernel import (
                depthwise_conv3d_pallas, dwconv3d_supported)
            B, D, H, W, C = x.shape
            if dwconv3d_supported(C, D, H, W, k, dil[0]):
                out = depthwise_conv3d_pallas(x, w, k, dil[0])
                return out if bias is None else out + bias.astype(out.dtype)
    if (w.shape[:3] == (3, 3, 3) and st == (1, 1, 1) and dil == (1, 1, 1)
            and groups == 1 and tuple(padding) == ((1, 1),) * 3):
        impl = os.environ.get("DLKA_CONV_IMPL", "auto")
        if impl == "im2col":
            return _conv3d_im2col(x, w, padding, bias)
        small_c = x.shape[-1] <= 32 and w.shape[-1] <= 32
        big_spatial = x.shape[1] * x.shape[2] * x.shape[3] >= (1 << 17)
        even = all(s % 2 == 0 for s in x.shape[1:4])
        tiny_im2col_ok = os.environ.get("DLKA_CONV_TINY_IM2COL", "1") == "1"
        if (impl == "auto" and big_spatial and 27 * x.shape[-1] <= 128
                and tiny_im2col_ok):
            # Tiny Cin (≤4, e.g. the encoder1 C1→16 stem conv): the
            # 27·Cin im2col column fits one lane tile, so one skinny
            # GEMM beats both the emitter and s2d (0.23 vs 1.60/0.92 ms
            # at full res, probe_conv_impls_r3, 2026-08-19).
            return _conv3d_im2col(x, w, padding, bias)
        if (impl == "s2d" or (impl == "auto" and small_c and big_spatial)) \
                and even:
            return _conv3d_s2d(x, w, bias)
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=st, padding=padding,
        rhs_dilation=dil, feature_group_count=groups,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), precision=precision)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def depthwise_conv2d(x, w, *, stride=1, padding="same", dilation=1, bias=None):
    """Depthwise 2D conv; w: (kh, kw, 1, C)."""
    return conv2d(x, w, stride=stride, padding=padding, dilation=dilation,
                  groups=x.shape[-1], bias=bias)


def _depthwise3d_zdecomp(x, w, dilation: int, bias):
    """Dilated 3D depthwise conv as k_z dilated **2D** depthwise convs
    (batched over the depth axis) summed across z-shifted slices.

    The TPU emitter handles 3D *dilated* depthwise convs very poorly
    (7³ dilation-3 at 32×64×64 C=32: **85 ms**) while its 2D dilated
    depthwise path is fine (7×7 dil-3 over the same voxels: 7.4 ms);
    decomposing over the z taps runs in **9.1 ms** — 9.3×. Exact for
    'same' (zero) padding: the z padding ring supplies the out-of-range
    z taps, the 2D conv handles the in-plane ones.
    """
    B, D, H, W, C = x.shape
    k = w.shape[0]
    d = dilation
    w = w.astype(x.dtype)
    pz = d * (k // 2)
    pp = d * (w.shape[1] // 2)
    xp = jnp.pad(x, ((0, 0), (pz, pz), (0, 0), (0, 0), (0, 0)))
    out = None
    for m in range(k):
        xs = lax.slice_in_dim(xp, m * d, m * d + D, axis=1)
        y = lax.conv_general_dilated(
            xs.reshape(B * D, H, W, C), w[m], (1, 1),
            ((pp, pp), (pp, pp)), rhs_dilation=(d, d),
            feature_group_count=C,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = y if out is None else out + y
    out = out.reshape(B, D, H, W, C)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _depthwise3d_atrous(x, w, dilation: int, bias):
    """Dilated 3D depthwise conv via the à trous identity:
    space-to-batch(d) → ONE dense k³ depthwise conv → batch-to-space.

    An output at p only reads inputs at p + d·t, i.e. the same residue
    class p mod d per axis — so the d³ phase sub-volumes are independent
    and each undergoes a DENSE k³ conv with the same weights. Exact for
    'same' zero padding (pad d·(k//2) = (k//2) per phase, which the
    dense conv's own 'same' padding supplies; axes are zero-padded up to
    multiples of d and the excess sliced off).

    Unlike `_depthwise3d_zdecomp` (k separate conv calls, k HBM
    intermediates) this issues a single conv on the shape the TPU
    emitter handles well (dense 7³ = 8.5 ms where dilated 7³ = 85 ms at
    the flagship stage-1 shape, PERF.md) plus two layout shuffles.
    """
    B, D, H, W, C = x.shape
    k = w.shape[0]
    d = dilation
    pads = [(-s) % d for s in (D, H, W)]
    xp = jnp.pad(x, ((0, 0), (0, pads[0]), (0, pads[1]), (0, pads[2]),
                     (0, 0)))
    Dp, Hp, Wp = D + pads[0], H + pads[1], W + pads[2]
    x6 = xp.reshape(B, Dp // d, d, Hp // d, d, Wp // d, d, C)
    x6 = jnp.transpose(x6, (0, 2, 4, 6, 1, 3, 5, 7))
    xb = x6.reshape(B * d ** 3, Dp // d, Hp // d, Wp // d, C)
    p = k // 2
    y = lax.conv_general_dilated(
        xb, w.astype(x.dtype), (1, 1, 1), ((p, p),) * 3,
        feature_group_count=C,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    y = y.reshape(B, d, d, d, Dp // d, Hp // d, Wp // d, C)
    y = jnp.transpose(y, (0, 4, 1, 5, 2, 6, 3, 7))
    y = y.reshape(B, Dp, Hp, Wp, C)[:, :D, :H, :W]
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def depthwise_conv3d(x, w, *, stride=1, padding="same", dilation=1, bias=None):
    """Depthwise 3D conv; w: (kd, kh, kw, 1, C). Dilated 'same' convs
    dispatch to the polyphase path inside conv3d."""
    return conv3d(x, w, stride=stride, padding=padding, dilation=dilation,
                  groups=x.shape[-1], bias=bias)


def _conv_transpose_d2s(x, w, st, bias):
    """k == s, p == 0 transposed conv as matmul + depth-to-space.

    out[b, z*sz+i, y*sy+j, x*sx+l, o] = sum_c x[b,z,y,x,c] w[i,j,l,c,o]
    — exact (same dot products, different lowering).
    """
    ndim = x.ndim - 2
    cin, cout = w.shape[-2], w.shape[-1]
    sp = x.shape[1:-1]
    # (s..., Cin, Cout) -> (Cin, s0*...*Cout)
    wm = jnp.moveaxis(w, -2, 0).reshape(cin, -1).astype(x.dtype)
    y = x.reshape(-1, cin) @ wm  # (B*prod(sp), prod(st)*Cout)
    y = y.reshape(x.shape[0], *sp, *st, cout)
    # interleave: (B, d0, d1, ..., s0, s1, ..., C) -> (B, d0, s0, d1, s1, ...)
    perm = [0]
    for i in range(ndim):
        perm += [1 + i, 1 + ndim + i]
    perm += [1 + 2 * ndim]
    y = y.transpose(perm).reshape(
        x.shape[0], *[d * s for d, s in zip(sp, st)], cout)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv_transpose(x, w, *, stride, padding="same", bias=None):
    """Transposed conv matching torch's ConvTransposeNd with
    padding = (k - s + 1) // 2 and output_padding = 2p + s - k
    (dynunet_block.py:265-277), i.e. output size = input * stride when k >= s.

    x: (B, *spatial, Cin), w: (*kernel, Cin, Cout) — note IO order: we store
    transposed-conv kernels as (spatial..., Cin, Cout).

    Implemented as lhs-dilated convolution with a spatially-flipped kernel,
    which is exactly torch's grad-of-conv formulation.
    """
    ndim = x.ndim - 2
    ks = w.shape[:ndim]
    st = _tuple(stride, ndim)
    if padding == "same":
        p = [pp[0] for pp in same_padding(ks, st, 1, ndim=ndim)]
    else:
        p = list(_tuple(padding, ndim))
    out_pad = [2 * pi + si - ki for pi, si, ki in zip(p, st, ks)]
    if any(op < 0 for op in out_pad):
        raise ValueError("negative output padding")
    if tuple(ks) == tuple(st) and all(pi == 0 for pi in p):
        # k == s (every flagship decoder upsample: (2,4,4) stem inverse
        # and the 2x stage transposes) -> each output voxel receives
        # exactly ONE tap: a per-voxel matmul + depth-to-space. The
        # lhs-dilated lax fallback below pays the emitter's dilated-conv
        # path for what is just a GEMM; this form keeps it on the MXU.
        return _conv_transpose_d2s(x, w, st, bias)
    # Equivalent dilated conv padding: lo = k - 1 - p, hi = k - 1 - p + out_pad
    pad_cfg = [(k - 1 - pi, k - 1 - pi + op)
               for k, pi, op in zip(ks, p, out_pad)]
    # Flip kernel spatially and swap I/O: (..., Cin, Cout) -> conv weight
    w_flip = jnp.flip(w, axis=tuple(range(ndim)))
    if ndim == 2:
        dn = ("NHWC", "HWIO", "NHWC")
    else:
        dn = ("NDHWC", "DHWIO", "NDHWC")
    out = lax.conv_general_dilated(
        x, w_flip.astype(x.dtype), window_strides=(1,) * ndim, padding=pad_cfg,
        lhs_dilation=st, dimension_numbers=dn)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
