"""2D flagship smoke tests: output shape + published param count
(101.64 M, BASELINE.md Synapse_2D)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from deformablelka_tpu.models.maxvit_dlka import MaxViTDeformableLKAFormer


def test_param_count_2d_flagship():
    model = MaxViTDeformableLKAFormer(num_classes=9)
    x = jnp.zeros((1, 224, 224, 1), jnp.float32)
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
    n = sum(int(np.prod(v.shape)) for v in
            jax.tree_util.tree_leaves(variables["params"]))
    # Published 101.64M includes ~23M of DEAD parameters: decoder_3's two
    # deformableLKABlocks + x1_linear are constructed but bypassed in
    # MaxViT_deform_LKA.py:618-620 (x2 is None → PatchExpand only). Flax
    # only materialises modules that are called, so the live count is
    # ~78.6M; the forward-path compute is identical.
    assert 75e6 < n < 82e6, f"{n/1e6:.2f}M live params (78.6M expected)"


@pytest.mark.slow
def test_forward_shape_small():
    """Full forward at reduced 64² resolution (window 2) for CPU speed."""
    model = MaxViTDeformableLKAFormer(num_classes=9, img_size=64)
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 64, 64, 9)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
def test_lka_baseline_smaller_and_runs():
    """deformable=False = the paper's LKA Baseline (MaxViT_LKA_Decoder.py):
    same decoder without offset nets / deform sampling → strictly fewer
    params, same output shape."""
    from deformablelka_tpu.models.maxvit_dlka import maxvit_lka_former
    import numpy as np

    base = maxvit_lka_former(num_classes=9, img_size=224)
    x = jnp.zeros((1, 224, 224, 1), jnp.float32)
    vb = base.init(jax.random.PRNGKey(0), x)
    nb = sum(np.prod(p.shape) for p in
             jax.tree_util.tree_leaves(vb["params"]))
    deform = MaxViTDeformableLKAFormer(num_classes=9)
    vd = deform.init(jax.random.PRNGKey(0), x)
    nd = sum(np.prod(p.shape) for p in
             jax.tree_util.tree_leaves(vd["params"]))
    assert nb < nd
    out = base.apply(vb, x)
    assert out.shape == (1, 224, 224, 9)


def test_subpixel_tail_parity():
    """DLKA_TAIL_SUBPIXEL=1 (expand+LN+head at H×W, shuffle n_class
    channels last) is numerically equivalent to the reference-ordered
    tail (shuffle C channels, then LN+head at 4H×4W): the 1×1 head is
    position-independent and every subpixel row is one output pixel of
    the shuffled map. Same params either way."""
    import os
    from deformablelka_tpu.models.maxvit_dlka import DecoderLayer

    layer = DecoderLayer(out_dim=16, n_class=5, is_last=True)
    rng = jax.random.PRNGKey(0)
    rs = np.random.RandomState(0)
    x1 = jnp.asarray(rs.randn(1, 8, 8, 16), jnp.float32)
    x2 = jnp.asarray(rs.randn(1, 8, 8, 16), jnp.float32)

    os.environ["DLKA_TAIL_SUBPIXEL"] = "0"
    try:
        variables = layer.init(rng, x1, x2)
        y_ref = layer.apply(variables, x1, x2)
        # bare apply retraces, so the trace-time knob is re-read
        os.environ["DLKA_TAIL_SUBPIXEL"] = "1"
        y_sub = layer.apply(variables, x1, x2)
    finally:
        del os.environ["DLKA_TAIL_SUBPIXEL"]
    assert y_ref.shape == y_sub.shape == (1, 32, 32, 5)
    np.testing.assert_allclose(np.asarray(y_sub), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
