"""Slow, obviously-correct numpy references for parity tests.

Written directly from the op definitions (torchvision DeformConv2d docs /
D3D kernel semantics at /root/reference/3D/dcn/src/cuda/
deform_im2col_cuda.cuh:192-265); deliberately loop-based so they can serve
as an independent oracle for the vectorised JAX ops.
"""

import numpy as np


def _bilinear2d(img, y, x):
    """img: (H, W, C); zero outside."""
    H, W, C = img.shape
    if y <= -1 or y >= H or x <= -1 or x >= W:
        return np.zeros(C, img.dtype)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    dy, dx = y - y0, x - x0
    val = np.zeros(C, np.float64)
    for oy, wy in ((0, 1 - dy), (1, dy)):
        for ox, wx in ((0, 1 - dx), (1, dx)):
            yy, xx = y0 + oy, x0 + ox
            if 0 <= yy < H and 0 <= xx < W:
                val += wy * wx * img[yy, xx]
    return val


def _trilinear3d(vol, z, y, x):
    """vol: (D, H, W, C); zero outside."""
    D, H, W, C = vol.shape
    z0, y0, x0 = int(np.floor(z)), int(np.floor(y)), int(np.floor(x))
    dz, dy, dx = z - z0, y - y0, x - x0
    val = np.zeros(C, np.float64)
    for oz, wz in ((0, 1 - dz), (1, dz)):
        for oy, wy in ((0, 1 - dy), (1, dy)):
            for ox, wx in ((0, 1 - dx), (1, dx)):
                zz, yy, xx = z0 + oz, y0 + oy, x0 + ox
                if 0 <= zz < D and 0 <= yy < H and 0 <= xx < W:
                    val += wz * wy * wx * vol[zz, yy, xx]
    return val


def deform_conv2d_ref(x, offset, w, bias=None, stride=1, padding=0,
                      dilation=1, groups=1):
    """x: (B,H,W,C), offset: (B,Ho,Wo,2K) (dy,dx per tap), w: (kh,kw,cpg,cout)."""
    B, H, W, C = x.shape
    kh, kw, cpg, cout = w.shape
    s, p, d = stride, padding, dilation
    Ho = (H + 2 * p - d * (kh - 1) - 1) // s + 1
    Wo = (W + 2 * p - d * (kw - 1) - 1) // s + 1
    opg = cout // groups
    out = np.zeros((B, Ho, Wo, cout), np.float64)
    for b in range(B):
        for ho in range(Ho):
            for wo in range(Wo):
                for i in range(kh):
                    for j in range(kw):
                        k = i * kw + j
                        dy = offset[b, ho, wo, 2 * k]
                        dx = offset[b, ho, wo, 2 * k + 1]
                        y = ho * s - p + i * d + dy
                        xx = wo * s - p + j * d + dx
                        samp = _bilinear2d(x[b], y, xx)  # (C,)
                        for g in range(groups):
                            sg = samp[g * cpg:(g + 1) * cpg]
                            out[b, ho, wo, g * opg:(g + 1) * opg] += (
                                sg @ w[i, j, :, g * opg:(g + 1) * opg])
    if bias is not None:
        out += bias
    return out


def deform_conv3d_ref(x, offset, w, bias=None, stride=1, padding=0,
                      dilation=1, groups=1):
    """x: (B,D,H,W,C), offset: (B,Do,Ho,Wo,3K) (dz,dy,dx per tap),
    w: (kd,kh,kw,cpg,cout)."""
    B, D, H, W, C = x.shape
    kd, kh, kw, cpg, cout = w.shape
    s, p, dl = stride, padding, dilation
    Do = (D + 2 * p - dl * (kd - 1) - 1) // s + 1
    Ho = (H + 2 * p - dl * (kh - 1) - 1) // s + 1
    Wo = (W + 2 * p - dl * (kw - 1) - 1) // s + 1
    opg = cout // groups
    out = np.zeros((B, Do, Ho, Wo, cout), np.float64)
    for b in range(B):
        for do in range(Do):
            for ho in range(Ho):
                for wo in range(Wo):
                    for i in range(kd):
                        for j in range(kh):
                            for m in range(kw):
                                k = (i * kh + j) * kw + m
                                dz = offset[b, do, ho, wo, 3 * k]
                                dy = offset[b, do, ho, wo, 3 * k + 1]
                                dx = offset[b, do, ho, wo, 3 * k + 2]
                                z = do * s - p + i * dl + dz
                                y = ho * s - p + j * dl + dy
                                xx = wo * s - p + m * dl + dx
                                if not (-1 < z < D and -1 < y < H and -1 < xx < W):
                                    continue
                                samp = _trilinear3d(x[b], z, y, xx)
                                for g in range(groups):
                                    sg = samp[g * cpg:(g + 1) * cpg]
                                    out[b, do, ho, wo, g * opg:(g + 1) * opg] += (
                                        sg @ w[i, j, m, :, g * opg:(g + 1) * opg])
    if bias is not None:
        out += bias
    return out
