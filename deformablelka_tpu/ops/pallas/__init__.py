"""Pallas TPU kernels for the hot ops."""

from deformablelka_tpu.ops.pallas.deform3d_kernel import (
    deform_conv3d_pallas, pallas_supported)

__all__ = ["deform_conv3d_pallas", "pallas_supported"]
