"""Pallas TPU kernel: 3D deformable convolution (3³, stride 1, dil 1).

This is the framework's replacement for the reference's only native
compute kernel — the D3D CUDA extension
(/root/reference/3D/dcn/src/cuda/deform_im2col_cuda.cuh:192-265:
per-thread trilinear gather + grouped GEMM). A TPU has no efficient
gather (XLA lowers it element-serialised, ~0.1 GB/s measured), so the
kernel uses the dense-window formulation (see ops/deform3d
.deform_conv3d_window): for every tap k with LOCAL offset Δ_k (clipped
to ±R),

    sample_k(p) = Σ_{s∈[-R,R+1]³} Π_ax hat(Δ_k,ax(p) − s_ax) · x(p+s)

where every x(p+s) is a STATIC slice of a VMEM-resident slab — pure VPU
FMAs — and the per-tap channel mixing Σ_ci sample_k(p,ci)·w_k(ci,co)
runs on the MXU. The whole computation reads x from HBM exactly once
per slab (async DMA with halo), which the XLA versions of this op
cannot achieve (each window term materialises an HBM-sized
intermediate).

Scope (everything the published 3D models need —
transformerblock.py:634-652): kernel 3×3×3, stride 1, dilation 1,
padding 1, groups=1. The dispatcher falls back to the XLA paths for
anything else. Backward: custom VJP delegating to the XLA window path's
autodiff (training-step parity; the forward hot loop is inference).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_supported(kd, kh, kw, stride, padding, dilation, groups, C,
                     cout) -> bool:
    from deformablelka_tpu.ops.convs import _tuple
    return (jax.default_backend() in ("tpu", "axon")
            and (kd, kh, kw) == (3, 3, 3)
            and tuple(_tuple(stride, 3)) == (1, 1, 1)
            and tuple(_tuple(padding, 3)) == (1, 1, 1)
            and tuple(_tuple(dilation, 3)) == (1, 1, 1)
            and groups == 1 and C == cout)


def _kernel(off_ref, w_ref, xp_hbm, out_ref, x_vmem, sem, *,
            SZ, H, W, C, R, m):
    """One grid step = one (batch, z-slab).

    off_ref: (1, SZ, H, W, 81) VMEM — (Δd, Δh, Δw) per tap, row-major.
    w_ref:   (27, C, C) VMEM.
    xp_hbm:  (B, D+2m, H+2m, W+2m, C) in HBM (pre-padded).
    out_ref: (1, SZ, H, W, C) VMEM.
    x_vmem:  (SZ+2m, H+2m, W+2m, C) scratch.
    """
    b = pl.program_id(0)
    zi = pl.program_id(1)

    dma = pltpu.make_async_copy(
        xp_hbm.at[b, pl.ds(zi * SZ, SZ + 2 * m)], x_vmem, sem)
    dma.start()
    dma.wait()

    s_vals = list(range(-R, R + 2))
    acc = jnp.zeros((SZ * H * W, C), jnp.float32)
    for k in range(27):
        bz, by, bx = k // 9 - 1, (k // 3) % 3 - 1, k % 3 - 1
        dz = off_ref[0, :, :, :, 3 * k].astype(jnp.float32)
        dy = off_ref[0, :, :, :, 3 * k + 1].astype(jnp.float32)
        dx = off_ref[0, :, :, :, 3 * k + 2].astype(jnp.float32)
        dz = jnp.clip(dz, -R, R)
        dy = jnp.clip(dy, -R, R)
        dx = jnp.clip(dx, -R, R)
        samp = jnp.zeros((SZ, H, W, C), jnp.float32)
        for sz in s_vals:
            hz = jnp.maximum(0.0, 1.0 - jnp.abs(dz - sz))
            for sy in s_vals:
                hzy = hz * jnp.maximum(0.0, 1.0 - jnp.abs(dy - sy))
                for sx in s_vals:
                    wgt = hzy * jnp.maximum(0.0, 1.0 - jnp.abs(dx - sx))
                    xs = x_vmem[m + bz + sz: m + bz + sz + SZ,
                                m + by + sy: m + by + sy + H,
                                m + bx + sx: m + bx + sx + W, :]
                    samp = samp + wgt[..., None] * xs.astype(jnp.float32)
        acc = acc + jnp.dot(samp.reshape(SZ * H * W, C),
                            w_ref[k].astype(jnp.float32),
                            preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(SZ, H, W, C).astype(out_ref.dtype)


def _forward(x, offset, w, radius: int, interpret: bool = False):
    """x: (B, D, H, W, C); offset: (B, D, H, W, 81); w: (3,3,3,C,C)."""
    B, D, H, W, C = x.shape
    R = radius
    m = R + 2  # window R+1 plus tap base 1
    xp = jnp.pad(x, ((0, 0), (m, m), (m, m), (m, m), (0, 0)))
    off = offset
    w_k = w.reshape(27, C, C)

    # pick a z-slab size dividing D, bounded by a VMEM budget
    SZ = D
    # budget: x_vmem + samp + acc + off slab, fp32 words
    def vmem_words(sz):
        return ((sz + 2 * m) * (H + 2 * m) * (W + 2 * m) * C
                + 2 * sz * H * W * C + sz * H * W * 81)
    while SZ > 1 and vmem_words(SZ) * 4 > 10 * 2 ** 20:
        # find the next smaller divisor of D
        SZ -= 1
        while SZ > 1 and D % SZ:
            SZ -= 1
    n_z = D // SZ

    kern = functools.partial(_kernel, SZ=SZ, H=H, W=W, C=C, R=R, m=m)
    flops = B * D * H * W * C * 27 * (2 * (2 * (R + 1)) ** 3 + 2 * C)
    out = pl.pallas_call(
        kern,
        grid=(B, n_z),
        in_specs=[
            pl.BlockSpec((1, SZ, H, W, 81),
                         lambda b, z: (b, z, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, SZ, H, W, C),
                               lambda b, z: (b, z, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D, H, W, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM(((SZ + 2 * m), (H + 2 * m), (W + 2 * m), C),
                       x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0),
        interpret=interpret,
    )(off, w_k, xp)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def deform_conv3d_pallas(x, offset, w, radius: int = 2,
                         interpret: bool = False):
    """Deformable 3³ conv (stride 1, dil 1, pad 1, groups 1) on TPU."""
    return _forward(x, offset, w, radius, interpret)


def _fwd(x, offset, w, radius, interpret):
    return _forward(x, offset, w, radius, interpret), (x, offset, w)


def _bwd(radius, interpret, res, g):
    from deformablelka_tpu.ops.deform3d import deform_conv3d_window
    x, offset, w = res

    def f(x, offset, w):
        return deform_conv3d_window(x, offset, w, None, stride=1,
                                    padding=1, dilation=1, groups=1,
                                    radius=radius)

    _, vjp = jax.vjp(f, x, offset, w)
    return vjp(g)


deform_conv3d_pallas.defvjp(_fwd, _bwd)
