"""Parity of the whole-block space-to-depth UnetResBlock fast path.

The fast path (nn/dynunet.UnetResBlock._call_s2d) packs once per block
and runs conv/IN/lrelu/residual in s2d space; it must match the plain
composition exactly up to float reassociation. Eligibility needs
spatial ≥ 2^17 voxels, so the golden-model tests (small shapes) never
exercise it — this test uses the smallest eligible shape.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deformablelka_tpu.nn.dynunet import UnetResBlock
from deformablelka_tpu.ops.convs import (
    conv3d, conv3d_s2d_space, conv1x1_s2d_space, instance_norm_s2d_space,
    s2d_pack, s2d_unpack)


def test_s2d_pack_roundtrip():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 4, 6, 8, 5), jnp.float32)
    np.testing.assert_array_equal(s2d_unpack(s2d_pack(x), 5), x)


def test_conv3d_s2d_space_parity():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(1, 8, 10, 12, 7), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 3, 7, 9) * 0.2, jnp.float32)
    ref = conv3d(x, w, stride=1, padding="same")
    got = s2d_unpack(conv3d_s2d_space(s2d_pack(x), w), 9)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_conv1x1_s2d_space_parity():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 6, 8, 10, 5), jnp.float32)
    w = jnp.asarray(rs.randn(1, 1, 1, 5, 11) * 0.3, jnp.float32)
    ref = conv3d(x, w, stride=1, padding="same")
    got = s2d_unpack(conv1x1_s2d_space(s2d_pack(x), w), 11)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_instance_norm_s2d_space_parity():
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, 6, 8, 10, 4) * 3 + 1, jnp.float32)
    xf = np.asarray(x, np.float32)
    mean = xf.mean(axis=(1, 2, 3), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 2, 3), keepdims=True)
    ref = (xf - mean) / np.sqrt(var + 1e-5)
    got = s2d_unpack(instance_norm_s2d_space(s2d_pack(x), 4), 4)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("cin,cout", [(16, 16), (1, 16)])
def test_unetresblock_s2d_path_parity(cin, cout):
    # smallest eligible shape: 64*64*32 = 2^17 voxels, even dims
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(1, 32, 64, 64, cin) * 0.5, jnp.float32)
    blk = UnetResBlock(3, cout, kernel_size=3, stride=1,
                       norm_name="instance")
    v = blk.init(jax.random.PRNGKey(0), x)

    prev = os.environ.get("DLKA_RESBLOCK_S2D")
    try:
        os.environ["DLKA_RESBLOCK_S2D"] = "0"
        ref = blk.apply(v, x)
        os.environ["DLKA_RESBLOCK_S2D"] = "1"
        got = blk.apply(v, x)
    finally:
        if prev is None:
            os.environ.pop("DLKA_RESBLOCK_S2D", None)
        else:
            os.environ["DLKA_RESBLOCK_S2D"] = prev
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-4)


def test_unetresblock_s2d_ineligible_odd_dims():
    # odd spatial dim → normal path; just runs
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(1, 31, 64, 64, 16) * 0.5, jnp.float32)
    blk = UnetResBlock(3, 16, kernel_size=3, stride=1,
                       norm_name="instance")
    v = blk.init(jax.random.PRNGKey(0), x)
    out = blk.apply(v, x)
    assert out.shape == (1, 31, 64, 64, 16)
