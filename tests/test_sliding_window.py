"""Sliding-window engine tests (SURVEY.md §4 layer 3): step grid vs the
nnUNet formula's documented values, Gaussian properties, and blending
correctness with a linear model."""

import numpy as np
import jax
import jax.numpy as jnp

from deformablelka_tpu.inference.sliding_window import (
    SlidingWindowInference, compute_steps, gaussian_importance_map,
    pad_to_min)


def test_steps_documented_example():
    # neural_network.py:272-274: image 110, patch 64, step 0.5 → [0, 23, 46]
    steps = compute_steps((64,), (110,), 0.5)
    assert steps == [[0, 23, 46]]


def test_steps_exact_fit_and_overlap():
    assert compute_steps((64, 128, 128), (64, 128, 128), 0.5) == \
        [[0], [0], [0]]
    s = compute_steps((64,), (128,), 0.5)
    assert s == [[0, 32, 64]]
    s = compute_steps((64,), (129,), 0.5)
    assert s[0][0] == 0 and s[0][-1] == 65 and len(s[0]) == 4


def test_gaussian_map():
    g = gaussian_importance_map((8, 16, 16))
    assert g.shape == (8, 16, 16)
    assert g.max() == 1.0
    assert (g > 0).all()
    assert g[4, 8, 8] == 1.0


def test_pad_to_min():
    x = np.arange(5 * 4 * 3 * 2, dtype=np.float32).reshape(5, 4, 3, 2)
    xp, slicer = pad_to_min(x, (8, 4, 6))
    assert xp.shape == (8, 4, 6, 2)
    np.testing.assert_array_equal(xp[tuple(slicer)], x)


def test_blending_identity_model():
    """A model returning fixed logits must yield exactly softmax(logits)
    everywhere after Gaussian blending, regardless of tiling."""
    ncls = 3
    logits = np.array([0.5, -1.0, 2.0], np.float32)

    def apply_fn(params, x):
        return jnp.broadcast_to(jnp.asarray(logits),
                                (*x.shape[:-1], ncls))

    sw = SlidingWindowInference(apply_fn, patch_size=(8, 8, 8),
                                num_classes=ncls, do_mirroring=True)
    vol = np.random.RandomState(0).randn(11, 14, 9, 1).astype(np.float32)
    probs = sw.predict({}, vol)
    assert probs.shape == (11, 14, 9, ncls)
    expect = np.exp(logits - logits.max())
    expect = expect / expect.sum()
    np.testing.assert_allclose(probs, np.broadcast_to(expect, probs.shape),
                               rtol=1e-5, atol=1e-5)


def test_blending_spatially_varying_model():
    """With a model that depends on input, overlapping-tile blending must be
    a convex combination: min/max bounded by per-tile min/max; and a
    single-tile volume must equal the direct forward."""
    ncls = 2

    def apply_fn(params, x):
        m = jnp.mean(x, axis=-1, keepdims=True)
        return jnp.concatenate([m, -m], axis=-1)

    sw = SlidingWindowInference(apply_fn, patch_size=(6, 6, 6),
                                num_classes=ncls, do_mirroring=False,
                                use_gaussian=True)
    vol = np.random.RandomState(1).randn(6, 6, 6, 1).astype(np.float32)
    probs = sw.predict({}, vol)
    direct = np.asarray(jax.nn.softmax(
        np.concatenate([vol.mean(-1, keepdims=True),
                        -vol.mean(-1, keepdims=True)], -1), axis=-1))
    np.testing.assert_allclose(probs, direct, rtol=1e-5, atol=1e-5)


def test_mirror_tta_symmetric_model():
    """For a flip-equivariant model (pointwise), TTA must not change the
    result."""
    ncls = 2

    def apply_fn(params, x):
        return jnp.concatenate([x, -x], axis=-1)

    vol = np.random.RandomState(2).randn(8, 8, 8, 1).astype(np.float32)
    sw_no = SlidingWindowInference(apply_fn, (8, 8, 8), ncls,
                                   do_mirroring=False)
    sw_yes = SlidingWindowInference(apply_fn, (8, 8, 8), ncls,
                                    do_mirroring=True)
    np.testing.assert_allclose(sw_no.predict({}, vol),
                               sw_yes.predict({}, vol), rtol=1e-5, atol=1e-6)


def test_sharded_sliding_window_matches_single_device():
    """shard_map tile-parallel path (8-dev CPU mesh) must reproduce the
    single-device blending bit-for-bit (same math, psum of disjoint
    accumulators)."""
    import flax.linen as nn
    from deformablelka_tpu.parallel.mesh import make_mesh
    from deformablelka_tpu.inference.sliding_window import (
        SlidingWindowInference)

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(4, (3, 3, 3))(x)
            return nn.Conv(3, (1, 1, 1))(nn.relu(h))

    model = Tiny()
    patch = (8, 8, 8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *patch, 1)))

    def apply_fn(v, x):
        return model.apply(v, x)

    vol = np.random.RandomState(0).randn(12, 14, 10, 1).astype(np.float32)

    sw1 = SlidingWindowInference(apply_fn, patch_size=patch, num_classes=3,
                                 step_size=0.5, do_mirroring=True)
    ref = sw1.predict(variables, vol)

    mesh = make_mesh(("data",))
    assert mesh.shape["data"] == 8
    sw8 = SlidingWindowInference(apply_fn, patch_size=patch, num_classes=3,
                                 step_size=0.5, do_mirroring=True,
                                 mesh=mesh)
    out = sw8.predict(variables, vol)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_host_loop_matches_scan_mode():
    """loop_mode='host' (one tile program + host loop) must equal the
    one-program scan mode exactly."""
    import flax.linen as nn
    from deformablelka_tpu.inference.sliding_window import (
        SlidingWindowInference)

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(4, (3, 3, 3))(x)
            return nn.Conv(3, (1, 1, 1))(nn.relu(h))

    model = Tiny()
    patch = (8, 8, 8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *patch, 1)))

    def apply_fn(v, x):
        return model.apply(v, x)

    vol = np.random.RandomState(0).randn(12, 14, 10, 1).astype(np.float32)
    sw_h = SlidingWindowInference(apply_fn, patch_size=patch,
                                  num_classes=3, do_mirroring=True)
    assert sw_h.loop_mode == "host"
    out_h = sw_h.predict(variables, vol)
    sw_s = SlidingWindowInference(apply_fn, patch_size=patch,
                                  num_classes=3, do_mirroring=True,
                                  loop_mode="scan")
    assert sw_s.loop_mode == "scan"
    out_s = sw_s.predict(variables, vol)
    np.testing.assert_allclose(out_h, out_s, rtol=1e-5, atol=1e-6)


def test_tta_batch_parity():
    """tta_batch=2/4/8 must reproduce tta_batch=1 exactly (the flips are
    just grouped into batched forwards); a non-equivariant model makes
    the check meaningful."""
    ncls = 3

    def apply_fn(params, x):
        # breaks flip symmetry via a position-dependent ramp
        B = x.shape[0]
        r = jnp.arange(x.shape[1], dtype=x.dtype).reshape(1, -1, 1, 1, 1)
        base = x * (1.0 + 0.1 * r)
        return jnp.concatenate([base, -base, 0.5 * base], axis=-1)

    vol = np.random.RandomState(3).randn(12, 10, 10, 1).astype(np.float32)
    ref = SlidingWindowInference(apply_fn, (8, 8, 8), ncls,
                                 tta_batch=1).predict({}, vol)
    for tb in (2, 4, 8, 3):
        got = SlidingWindowInference(apply_fn, (8, 8, 8), ncls,
                                     tta_batch=tb).predict({}, vol)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_predict_segmentation_device_argmax():
    """predict_segmentation (device argmax, uint8 fetch) must equal
    argmax over the host-fetched softmax."""
    import flax.linen as nn
    from deformablelka_tpu.inference.sliding_window import (
        SlidingWindowInference)

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(3, (3, 3, 3))(x)

    model = Tiny()
    patch = (8, 8, 8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *patch, 1)))
    sw = SlidingWindowInference(lambda v, x: model.apply(v, x),
                                patch_size=patch, num_classes=3)
    vol = np.random.RandomState(1).randn(10, 13, 9, 1).astype(np.float32)
    seg = sw.predict_segmentation(variables, vol)
    ref = np.argmax(sw.predict(variables, vol), axis=-1)
    assert seg.shape == vol.shape[:3]
    assert seg.dtype == np.uint8
    np.testing.assert_array_equal(seg, ref)


def test_shape_buckets_compile_once_and_exact():
    """Pad-to-bucket compilation (VERDICT r2 item 2): ≥6 distinct case
    shapes through ONE engine must compile ≤2 scan programs, and every
    result must equal the unbucketed engine's bit-for-bit (origins are
    computed on the min-padded shape; the bucket padding is never
    read)."""

    def apply_fn(params, x):
        # spatially varying so bucketing errors would show
        g = jnp.linspace(-1.0, 1.0, x.shape[2])[None, None, :, None, None]
        base = x[..., :1] * 0.3 + g
        return jnp.concatenate([base, -base], axis=-1)

    patch = (8, 8, 8)
    shapes = [(11, 14, 9), (12, 13, 10), (9, 15, 11), (10, 16, 12),
              (12, 16, 12), (11, 13, 9)]
    sw = SlidingWindowInference(apply_fn, patch_size=patch,
                                num_classes=2, do_mirroring=False,
                                loop_mode="scan")
    ref = SlidingWindowInference(apply_fn, patch_size=patch,
                                 num_classes=2, do_mirroring=False,
                                 loop_mode="scan", shape_buckets=False)
    rs = np.random.RandomState(0)
    for shp in shapes:
        vol = rs.randn(*shp, 1).astype(np.float32)
        got = sw.predict({}, vol)
        want = ref.predict({}, vol)
        assert got.shape == (*shp, 2)
        np.testing.assert_array_equal(got, want)
    # shapes span (9..12, 13..16, 9..12) → buckets (12,16,12) only
    # (every axis lands in the same p+k*4 bucket) → exactly 1 build;
    # the unbucketed engine compiled one per distinct padded shape.
    assert sw.n_builds <= 2, sw.n_builds
    assert ref.n_builds == len(set(shapes))
