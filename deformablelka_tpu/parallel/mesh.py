"""Device-mesh / sharding layer — the TPU-native replacement for the
reference's DataParallel (SURVEY.md §2.7).

The reference's only multi-device strategy is `nn.DataParallel`
(2D/trainer_MaxViT_deform_LKA.py:107-108) plus a vestigial, unused
torch.distributed allgather (3D .../utilities/distributed.py:19-61). Here
parallelism is first-class:

- `make_mesh(("data",))` builds a 1-D mesh over all devices (ICI ring on a
  TPU slice); training shards the batch dim, XLA inserts the psum for
  gradients automatically under jit.
- Sliding-window inference shards the *tile* axis across the mesh (tiles
  are embarrassingly parallel) — see inference/sliding_window.py.
- A 2-D mesh ("data", "space") supports spatial sharding of large volumes
  (halo exchange handled by XLA's conv partitioning under shard_map).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_names: Sequence[str] = ("data",), devices=None,
              shape: Sequence[int] | None = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = [n] + [1] * (len(axis_names) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host batch (leading dim divisible by mesh size) onto the
    mesh, sharded over the batch dimension."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch)
