"""deformablelka_tpu — TPU-native 2D/3D medical-image segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
xmindflow/deformableLKA ("Beyond Self-Attention: Deformable Large Kernel
Attention for Medical Image Segmentation", WACV 2024):

- 2D D-LKA Net (MaxViT encoder + deformable-LKA decoder) for Synapse/skin.
- 3D D-LKA Former (hierarchical encoder-decoder, deformable 3D conv) for
  Synapse/ACDC/Pancreas.
- nnUNet-style preprocessing, sliding-window inference with Gaussian
  blending + mirror TTA, training engines, evaluation and postprocessing.

Everything is channels-last (NHWC / NDHWC), jit-first, and shards over a
`jax.sharding.Mesh` for multi-chip execution.
"""

__version__ = "0.1.0"

from deformablelka_tpu import ops  # noqa: F401
