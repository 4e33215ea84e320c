"""Native C++ affine-resampler: parity vs scipy + speed sanity."""

import numpy as np
import pytest
from scipy import ndimage

import deformablelka_tpu.native as native


@pytest.fixture(scope="module")
def vol():
    return np.random.RandomState(0).randn(24, 30, 28).astype(np.float32)


def _rand_affine(seed=1):
    rng = np.random.RandomState(seed)
    ang = rng.uniform(-0.4, 0.4, 3)

    def rot(a, i, j):
        m = np.eye(3)
        m[i, i] = m[j, j] = np.cos(a)
        m[i, j] = -np.sin(a)
        m[j, i] = np.sin(a)
        return m

    m = rot(ang[0], 0, 1) @ rot(ang[1], 0, 2) @ rot(ang[2], 1, 2)
    m *= rng.uniform(0.8, 1.2)
    off = rng.uniform(-2, 2, 3)
    return m, off


def test_native_builds():
    native._load()
    if not native.HAVE_NATIVE:
        pytest.skip("no g++ toolchain — scipy fallback in use")
    assert native.num_threads() >= 1


@pytest.mark.parametrize("order", [0, 1])
def test_affine_parity_constant(vol, order):
    m, off = _rand_affine()
    ours = native.affine_transform(vol, m, off, (20, 22, 18), order=order,
                                   cval=0.0)
    ref = ndimage.affine_transform(vol, m, off, (20, 22, 18), order=order,
                                   mode="constant", cval=0.0)
    np.testing.assert_allclose(ours, ref.astype(np.float32),
                               atol=2e-5, rtol=1e-5)


def test_affine_parity_cubic_mirror(vol):
    m, off = _rand_affine(2)
    ours = native.affine_transform(vol, m, off, (20, 22, 18), order=3)
    ref = ndimage.affine_transform(vol.astype(np.float64), m, off,
                                   (20, 22, 18), order=3, mode="mirror")
    np.testing.assert_allclose(ours, ref.astype(np.float32),
                               atol=5e-4, rtol=1e-3)


def test_spline_filter_parity(vol):
    ours = native.spline_filter3(vol)
    ref = ndimage.spline_filter(vol.astype(np.float64), order=3,
                                mode="mirror")
    np.testing.assert_allclose(ours, ref, atol=1e-8, rtol=1e-8)


def test_identity_transform_is_identity(vol):
    out = native.affine_transform(vol, np.eye(3), np.zeros(3), vol.shape,
                                  order=3)
    np.testing.assert_allclose(out, vol, atol=1e-4, rtol=1e-4)


def test_native_faster_than_scipy_or_skip(vol):
    if not native.HAVE_NATIVE:
        pytest.skip("native lib unavailable")
    import time
    big = np.random.RandomState(1).randn(64, 96, 96).astype(np.float32)
    m, off = _rand_affine(3)
    # warm both
    native.affine_transform(big, m, off, big.shape, order=3)
    ndimage.affine_transform(big, m, off, big.shape, order=3,
                             mode="mirror")
    t0 = time.perf_counter()
    native.affine_transform(big, m, off, big.shape, order=3)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    ndimage.affine_transform(big, m, off, big.shape, order=3,
                             mode="mirror")
    t_sp = time.perf_counter() - t0
    # Threaded native should not be slower; don't gate hard on exact
    # ratios in CI-like environments.
    assert t_nat < t_sp * 1.5, (t_nat, t_sp)
