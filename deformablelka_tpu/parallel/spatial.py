"""Spatial (sequence-parallel analog) sharding: halo-exchange convs.

The reference never shards a volume — it tiles (SURVEY.md §5 "long
context"), because training patches are 64×128×128. For single-volume
residency across chips (whole-CT inference without tiling, or patches
too large for one chip's HBM) the TPU-native mechanism is a 1-D spatial
shard over the depth axis with halo exchange on the ICI ring:

  - each device holds a contiguous D/n-slab of the volume,
  - before a stencil of radius r, neighbours exchange r-deep boundary
    slabs via `lax.ppermute` (two shifts, up and down the ring),
  - the conv then runs on the locally-haloed slab with 'valid' depth
    semantics; edge devices zero-pad (matching 'same' zero padding).

`halo_exchange` is the communication primitive; `spatial_conv3d` the
stencil wrapper; `spatial_shard_map_conv3d` builds the jitted
shard_map program for a (.., "space") mesh axis. Exactness vs the
unsharded conv is tested on an 8-device CPU mesh
(tests/test_spatial_sharding.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map


def shard_map(f, **kw):
    try:
        return _shard_map(f, check_vma=False, **kw)
    except TypeError:  # pragma: no cover - older jax
        return _shard_map(f, check_rep=False, **kw)


def halo_exchange(x, radius: int, axis_name: str, *, dim: int = 1):
    """Append each neighbour's boundary slab of depth `radius` along
    `dim` (zero slabs at the ring's ends). x: local (B, D/n, ..., C).

    Returns the locally-haloed block of extent D/n + 2*radius.
    """
    if radius > x.shape[dim]:
        raise ValueError(
            f"halo radius {radius} exceeds the local slab extent "
            f"{x.shape[dim]} — use fewer shards or a smaller stencil "
            "(exchange only reaches immediate ring neighbours)")
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    lo = lax.slice_in_dim(x, 0, radius, axis=dim)
    hi_start = x.shape[dim] - radius
    hi = lax.slice_in_dim(x, hi_start, x.shape[dim], axis=dim)
    # send my top slab down (i -> i+1): received block is my upper halo
    from_prev = lax.ppermute(hi, axis_name,
                             [(i, (i + 1) % n) for i in range(n)])
    # send my bottom slab up (i -> i-1): received block is my lower halo
    from_next = lax.ppermute(lo, axis_name,
                             [(i, (i - 1) % n) for i in range(n)])
    zero = jnp.zeros_like(lo)
    from_prev = jnp.where(idx == 0, zero, from_prev)
    from_next = jnp.where(idx == n - 1, zero, from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=dim)


def spatial_conv3d(x, w, axis_name: str, *, bias=None, dilation=1,
                   groups: int = 1):
    """'same'-padded stride-1 3D conv on a depth-sharded volume.

    x: local slab (B, D/n, H, W, Cin) inside shard_map; w as in
    ops.convs.conv3d. The depth receptive radius dil*(kd//2) is
    exchanged with ring neighbours; H/W are fully local.
    """
    from deformablelka_tpu.ops.convs import conv3d, _tuple
    kd = w.shape[0]
    dil = _tuple(dilation, 3)
    r = dil[0] * (kd // 2)
    if r > 0:
        x = halo_exchange(x, r, axis_name, dim=1)
    ph = dil[1] * (w.shape[1] // 2)
    pw = dil[2] * (w.shape[2] // 2)
    return conv3d(x, w, padding=((0, 0), (ph, ph), (pw, pw)),
                  dilation=dilation, groups=groups, bias=bias)


def spatial_shard_map_conv3d(mesh: Mesh, axis: str = "space", *,
                             dilation=1, groups: int = 1):
    """Jitted whole-volume 'same' 3D conv with the volume depth-sharded
    over `axis`. Returns f(x, w, bias) taking/giving global arrays."""

    def local_fn(x, w, bias):
        return spatial_conv3d(x, w, axis, bias=bias, dilation=dilation,
                              groups=groups)

    f = shard_map(local_fn, mesh=mesh,
                  in_specs=(P(None, axis), P(), P()),
                  out_specs=P(None, axis))
    return jax.jit(f)
