"""Spatial (depth) sharding with halo exchange: parity vs unsharded."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deformablelka_tpu.parallel.mesh import make_mesh
from deformablelka_tpu.parallel.spatial import spatial_shard_map_conv3d


@pytest.mark.parametrize("k,dil,groups_all", [
    (3, 1, False), (5, 1, False), (3, 2, False), (3, 1, True),
])
def test_spatial_conv_matches_unsharded(k, dil, groups_all):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(("space",))
    rs = np.random.RandomState(0)
    C = 6
    groups = C if groups_all else 1
    x = jnp.asarray(rs.randn(2, 16, 8, 10, C), jnp.float32)
    w = jnp.asarray(rs.randn(k, k, k, C // groups, C), jnp.float32)
    b = jnp.asarray(rs.randn(C), jnp.float32)

    from deformablelka_tpu.ops.convs import conv3d
    ref = conv3d(x, w, padding=dil * (k // 2), dilation=dil,
                 groups=groups, bias=b)

    f = spatial_shard_map_conv3d(mesh, dilation=dil, groups=groups)
    got = f(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4)


def test_halo_exchange_ends_are_zero():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from deformablelka_tpu.parallel.spatial import halo_exchange, shard_map
    from jax.sharding import PartitionSpec as P
    mesh = make_mesh(("space",))
    x = jnp.ones((1, 16, 2, 2, 1), jnp.float32)

    f = shard_map(lambda x: halo_exchange(x, 1, "space"), mesh=mesh,
                  in_specs=(P(None, "space"),),
                  out_specs=P(None, "space"))
    out = np.asarray(jax.jit(f)(x))
    # each local block gains 2 halo planes -> global depth 16 + 2*8
    assert out.shape[1] == 16 + 2 * 8
    # first device's lower halo and last device's upper halo are zero
    assert out[0, 0].max() == 0.0
    assert out[0, -1].max() == 0.0
    # interior halos carry the neighbour's ones
    assert out[0, 1].min() == 1.0


def test_dp_sp_train_step():
    """2-axis (data x space) training step from __graft_entry__: grads
    flow through ppermute halo exchanges; loss decreases over steps."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    g._dryrun_dp_sp(8)
