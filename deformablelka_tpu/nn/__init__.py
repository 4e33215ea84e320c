"""Module layer (flax.linen): norms, attention/op blocks, UNet blocks.

Submodule attribute names intentionally mirror the reference's torch
attribute names so the torch→JAX weight converter is a mechanical key map.
"""

from deformablelka_tpu.nn.norms import (
    LayerNorm,
    BatchNorm,
    GroupNorm,
    InstanceNorm,
)
