"""Pallas TPU kernel: FUSED LKA chain (dw5 → dilated dw7 → 1×1 gate).

The LKA gate (reference: /root/reference/2D/deformable_LKA/LKA.py:4-18,
3D analog /root/reference/3D/.../synapse/transformerblock.py:349-392)
is a three-stage chain whose two depthwise stages are HBM-bound: run
separately, the dw5 output round-trips through HBM before the dilated
dw7 consumes it. This kernel evaluates BOTH depthwise stages (plus
their biases) in one pallas_call, keeping the intermediate entirely in
VMEM; the trailing 1×1 conv and the multiplicative gate stay in XLA,
where they fuse into a single channel-mixing GEMM epilogue (grid here
is per-channel, so channel mixing cannot live in this kernel; an
in-kernel GEMM fed by loop carries is also a known remote-Mosaic
compile failure — PERF.md constraint #4).

Layout: the chain's receptive halo is M = 2 + 3·3 = 11, so halo'd
channel-last tiles would pay a ~21× pre-slice blowup under the
non-overlapping BlockSpec model (see dwconv3d_kernel._make_tiles). This
kernel instead puts the LAST SPATIAL DIM in the lane dim and a full
per-channel (sub)volume in each grid step:

    grid = (B, C); block = (1, 1, D+2M, H+2M, 128)   [W + 2M ≤ 128]

All tap shifts are STATIC slices (python-unrolled over the 125+343 /
25+49 taps), the dilated stage slices the stage-1 VALUE at stride-3
static offsets, and the stage-1 result is masked to the valid extent so
the dilated stage sees the reference's zero 'same' padding, not
conv-of-halo values. Every real LKA site in the model zoo fits the
lane bound (largest W: 56+22=78 for 2D stage-1, 48+22=70 for pancreas
3D); `lka*_fused_supported` gates the rest back to the XLA chain.

Numerics: f32 in-kernel (remote-Mosaic rejects bf16 blocks); exact vs
the XLA chain at f32. The backward delegates to XLA autodiff of the
identical unfused chain (recomputation, zero scatters).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_LANES = 128
M3 = 11  # chain halo: dw5 (2) + dw7 dilation 3 (9)
M2 = 9   # dilated-stage halo


def _interpret_forced() -> bool:
    """DLKA_LKA_INTERPRET=1 runs the kernel in interpret mode on any
    backend — lets CPU tests exercise the exact module dispatch path."""
    import os
    return os.environ.get("DLKA_LKA_INTERPRET") == "1"


def _backend_ok() -> bool:
    return (jax.default_backend() in ("tpu", "axon")
            or _interpret_forced())


def lka3d_fused_supported(D, H, W, dil=3):
    # (D+22)·(H+22) ≤ 1152: remote Mosaic rejects kernels whose values
    # exceed ~1152 in non-lane-dim product (bisected 2026-08-17:
    # (38,30,·) compiles, (34,34,·) does not — PERF.md constraint #7).
    return (_backend_ok() and dil == 3 and W + 2 * M3 <= MAX_LANES
            and (D + 2 * M3) * (H + 2 * M3) <= 1152
            and min(D, H, W) >= 1)


def lka2d_fused_supported(H, W, dil=3):
    return (_backend_ok() and dil == 3 and W + 2 * M3 <= MAX_LANES
            and min(H, W) >= 1)


def _chain3d_kernel(w5_ref, w7_ref, b_ref, x_ref, o_ref, *, D, H, W):
    """One grid step = one (batch, channel).

    w5_ref: (1, 125, 1) f32 taps row-major (kz, ky, kx).
    w7_ref: (1, 343, 1) f32 taps row-major (dz, dy, dx).
    b_ref:  (1, 2, 1) f32 — (dw5 bias, dw7 bias).
    x_ref:  (1, 1, D+2M, H+2M, 128) f32; lane l holds w = l - M,
            zero outside [0, W).
    o_ref:  (1, 1, D, H, W).
    """
    Z1, Y1, W1 = D + 2 * M2, H + 2 * M2, W + 2 * M2
    x = x_ref[0, 0]

    acc = jnp.zeros((Z1, Y1, W1), jnp.float32)
    for kz in range(5):
        for ky in range(5):
            for kx in range(5):
                q = (kz * 5 + ky) * 5 + kx
                acc = acc + w5_ref[0, q, 0] * x[
                    kz:kz + Z1, ky:ky + Y1, kx:kx + W1]
    # mask to the true image extent: the dilated stage must read ZERO
    # outside it (reference zero-pads the dw5 *output*), and the dw5
    # bias only applies inside.
    iz = jax.lax.broadcasted_iota(jnp.int32, (Z1, Y1, W1), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (Z1, Y1, W1), 1)
    il = jax.lax.broadcasted_iota(jnp.int32, (Z1, Y1, W1), 2)
    valid = ((iz >= M2) & (iz < M2 + D) & (iy >= M2) & (iy < M2 + H)
             & (il >= M2) & (il < M2 + W))
    y1 = jnp.where(valid, acc + b_ref[0, 0, 0], 0.0)

    acc2 = jnp.zeros((D, H, W), jnp.float32)
    for dz in range(7):
        for dy in range(7):
            for dx in range(7):
                q = (dz * 7 + dy) * 7 + dx
                acc2 = acc2 + w7_ref[0, q, 0] * y1[
                    3 * dz:3 * dz + D, 3 * dy:3 * dy + H,
                    3 * dx:3 * dx + W]
    o_ref[0, 0] = acc2 + b_ref[0, 1, 0]


def _chain2d_kernel(w5_ref, w7_ref, b_ref, x_ref, o_ref, *, H, W):
    """2D analog: x_ref (1, 1, H+2M, 128) → o_ref (1, 1, H, W)."""
    Y1, W1 = H + 2 * M2, W + 2 * M2
    x = x_ref[0, 0]
    acc = jnp.zeros((Y1, W1), jnp.float32)
    for ky in range(5):
        for kx in range(5):
            q = ky * 5 + kx
            acc = acc + w5_ref[0, q, 0] * x[ky:ky + Y1, kx:kx + W1]
    iy = jax.lax.broadcasted_iota(jnp.int32, (Y1, W1), 0)
    il = jax.lax.broadcasted_iota(jnp.int32, (Y1, W1), 1)
    valid = (iy >= M2) & (iy < M2 + H) & (il >= M2) & (il < M2 + W)
    y1 = jnp.where(valid, acc + b_ref[0, 0, 0], 0.0)

    acc2 = jnp.zeros((H, W), jnp.float32)
    for dy in range(7):
        for dx in range(7):
            q = dy * 7 + dx
            acc2 = acc2 + w7_ref[0, q, 0] * y1[
                3 * dy:3 * dy + H, 3 * dx:3 * dx + W]
    o_ref[0, 0] = acc2 + b_ref[0, 1, 0]


def _prep_w(w, taps, C):
    """(k..., 1, C) torch-layout depthwise weights → (C, taps, 1) f32."""
    return jnp.transpose(w.reshape(taps, C)).reshape(C, taps, 1).astype(
        jnp.float32)


def _prep_b(b5, b7, C):
    b5 = jnp.zeros((C,), jnp.float32) if b5 is None else b5
    b7 = jnp.zeros((C,), jnp.float32) if b7 is None else b7
    return jnp.stack([b5.astype(jnp.float32),
                      b7.astype(jnp.float32)], axis=1).reshape(C, 2, 1)


def _dw_chain3d(x, w_dw, b_dw, w_dil, b_dil, interpret=False):
    """Fused dw5³ → dw7³-dil3 (+biases). x: (B, D, H, W, C) → same."""
    interpret = interpret or _interpret_forced()
    B, D, H, W, C = x.shape
    xt = jnp.transpose(x.astype(jnp.float32), (0, 4, 1, 2, 3))
    xt = jnp.pad(xt, ((0, 0), (0, 0), (M3, M3), (M3, M3),
                      (M3, MAX_LANES - W - M3)))
    w5 = _prep_w(w_dw, 125, C)
    w7 = _prep_w(w_dil, 343, C)
    bb = _prep_b(b_dw, b_dil, C)
    kern = functools.partial(_chain3d_kernel, D=D, H=H, W=W)
    out = pl.pallas_call(
        kern,
        grid=(B, C),
        in_specs=[
            pl.BlockSpec((1, 125, 1), lambda b, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 343, 1), lambda b, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 1), lambda b, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D + 2 * M3, H + 2 * M3, MAX_LANES),
                         lambda b, c: (b, c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, D, H, W),
                               lambda b, c: (b, c, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, D, H, W), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * C * D * H * W * (125 + 343),
            bytes_accessed=2 * x.size * 4, transcendentals=0),
        interpret=interpret,
    )(w5, w7, bb, xt)
    return jnp.transpose(out, (0, 2, 3, 4, 1))


def _dw_chain2d(x, w_dw, b_dw, w_dil, b_dil, interpret=False):
    """Fused dw5² → dw7²-dil3 (+biases). x: (B, H, W, C) → same."""
    interpret = interpret or _interpret_forced()
    B, H, W, C = x.shape
    xt = jnp.transpose(x.astype(jnp.float32), (0, 3, 1, 2))
    xt = jnp.pad(xt, ((0, 0), (0, 0), (M3, M3),
                      (M3, MAX_LANES - W - M3)))
    w5 = _prep_w(w_dw, 25, C)
    w7 = _prep_w(w_dil, 49, C)
    bb = _prep_b(b_dw, b_dil, C)
    kern = functools.partial(_chain2d_kernel, H=H, W=W)
    out = pl.pallas_call(
        kern,
        grid=(B, C),
        in_specs=[
            pl.BlockSpec((1, 25, 1), lambda b, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 49, 1), lambda b, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 1), lambda b, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H + 2 * M3, MAX_LANES),
                         lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, H, W),
                               lambda b, c: (b, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * C * H * W * (25 + 49),
            bytes_accessed=2 * x.size * 4, transcendentals=0),
        interpret=interpret,
    )(w5, w7, bb, xt)
    return jnp.transpose(out, (0, 2, 3, 1))


def _chain3d_ref(x, w_dw, b_dw, w_dil, b_dil):
    from deformablelka_tpu.ops.convs import depthwise_conv3d
    y = depthwise_conv3d(x, w_dw, padding=2, bias=b_dw)
    return depthwise_conv3d(y, w_dil, padding=9, dilation=3, bias=b_dil)


def _chain2d_ref(x, w_dw, b_dw, w_dil, b_dil):
    from deformablelka_tpu.ops.convs import depthwise_conv2d
    y = depthwise_conv2d(x, w_dw, padding=2, bias=b_dw)
    return depthwise_conv2d(y, w_dil, padding=9, dilation=3, bias=b_dil)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def dw_chain3d_fused(x, w_dw, b_dw, w_dil, b_dil, interpret=False):
    """Fused dw5³ → dw7³-dil3 (+biases), one pallas_call. Drop-in for
    the two depthwise Conv3d calls of the LKA gate; returns x.dtype."""
    return _dw_chain3d(x, w_dw, b_dw, w_dil, b_dil,
                       interpret).astype(x.dtype)


def _c3_fwd(x, w_dw, b_dw, w_dil, b_dil, interpret):
    out = dw_chain3d_fused(x, w_dw, b_dw, w_dil, b_dil, interpret)
    return out, (x, w_dw, b_dw, w_dil, b_dil)


def _c3_bwd(interpret, res, g):
    _, vjp = jax.vjp(_chain3d_ref, *res)
    return vjp(g.astype(res[0].dtype))


dw_chain3d_fused.defvjp(_c3_fwd, _c3_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def dw_chain2d_fused(x, w_dw, b_dw, w_dil, b_dil, interpret=False):
    """Fused dw5² → dw7²-dil3 (+biases), one pallas_call."""
    return _dw_chain2d(x, w_dw, b_dw, w_dil, b_dil,
                       interpret).astype(x.dtype)


def _c2_fwd(x, w_dw, b_dw, w_dil, b_dil, interpret):
    out = dw_chain2d_fused(x, w_dw, b_dw, w_dil, b_dil, interpret)
    return out, (x, w_dw, b_dw, w_dil, b_dil)


def _c2_bwd(interpret, res, g):
    _, vjp = jax.vjp(_chain2d_ref, *res)
    return vjp(g.astype(res[0].dtype))


dw_chain2d_fused.defvjp(_c2_fwd, _c2_bwd)


def _gate(x, y2, w_pw, b_pw):
    """Trailing 1×1 conv + multiplicative gate, left to XLA (fuses into
    one GEMM epilogue): x * (y2 @ w_pw + b)."""
    C = x.shape[-1]
    attn = jnp.einsum("...i,io->...o", y2.astype(x.dtype),
                      w_pw.reshape(C, -1).astype(x.dtype))
    if b_pw is not None:
        attn = attn + b_pw.astype(x.dtype)
    return x * attn


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def lka3d_fused(x, w_dw, b_dw, w_dil, b_dil, w_pw, b_pw,
                interpret=False):
    """Fused-kernel LKA gate: x * conv1³(dwdil7³(dw5³(x))).

    Drop-in for ops.lka.lka3d (same signature/weight layouts); the two
    depthwise stages run in one Pallas kernel.
    """
    y2 = _dw_chain3d(x, w_dw, b_dw, w_dil, b_dil, interpret)
    return _gate(x, y2, w_pw, b_pw)


def _lka3d_ref(x, w_dw, b_dw, w_dil, b_dil, w_pw, b_pw):
    from deformablelka_tpu.ops.lka import lka3d
    return lka3d(x, w_dw, b_dw, w_dil, b_dil, w_pw, b_pw)


def _lka3d_fwd(x, w_dw, b_dw, w_dil, b_dil, w_pw, b_pw, interpret):
    out = lka3d_fused(x, w_dw, b_dw, w_dil, b_dil, w_pw, b_pw,
                      interpret)
    return out, (x, w_dw, b_dw, w_dil, b_dil, w_pw, b_pw)


def _lka3d_bwd(interpret, res, g):
    _, vjp = jax.vjp(_lka3d_ref, *res)
    return vjp(g)


lka3d_fused.defvjp(_lka3d_fwd, _lka3d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def lka2d_fused(x, w_dw, b_dw, w_dil, b_dil, w_pw, b_pw,
                interpret=False):
    """Fused-kernel 2D LKA gate, drop-in for ops.lka.lka2d."""
    y2 = _dw_chain2d(x, w_dw, b_dw, w_dil, b_dil, interpret)
    return _gate(x, y2, w_pw, b_pw)


def _lka2d_ref(x, w_dw, b_dw, w_dil, b_dil, w_pw, b_pw):
    from deformablelka_tpu.ops.lka import lka2d
    return lka2d(x, w_dw, b_dw, w_dil, b_dil, w_pw, b_pw)


def _lka2d_fwd(x, w_dw, b_dw, w_dil, b_dil, w_pw, b_pw, interpret):
    out = lka2d_fused(x, w_dw, b_dw, w_dil, b_dil, w_pw, b_pw,
                      interpret)
    return out, (x, w_dw, b_dw, w_dil, b_dil, w_pw, b_pw)


def _lka2d_bwd(interpret, res, g):
    _, vjp = jax.vjp(_lka2d_ref, *res)
    return vjp(g)


lka2d_fused.defvjp(_lka2d_fwd, _lka2d_bwd)
