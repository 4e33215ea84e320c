"""Shape/param smoke tests for the 3D D-LKA Former.

Mirrors the reference's __main__ shape tests and fvcore param printouts
(SURVEY.md §4; d_lka_former_trainer_synapse.py:185-193)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deformablelka_tpu.models.dlka_former import DLKAFormer


@pytest.mark.slow
def test_forward_shapes_fast_variant():
    # depths=1 keeps this full-model smoke test ~4x cheaper on 1 CPU.
    # Moved to the slow suite in round 5 (47 s of the fast suite's
    # 9:03): the fast suite's full-3D-forward coverage comes from
    # test_golden_3d (real forwards vs the reference's torch code);
    # this adds only DS-shape plumbing on top, which the slow
    # parametrized test_forward_shapes also covers.
    test_forward_shapes("TransformerBlock_3D_LKA", depths=(1, 1, 1, 1))


def _build(trans_block, img=(16, 32, 32), patch=(2, 4, 4), ncls=4,
           depths=None):
    kw = {} if depths is None else {"depths": tuple(depths)}
    model = DLKAFormer(out_channels=ncls, img_size=img, patch_size=patch,
                       do_ds=True, trans_block=trans_block, **kw)
    x = jnp.zeros((1, *img, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables, x


@pytest.mark.slow
@pytest.mark.parametrize("trans_block", [
    "TransformerBlock",
    "TransformerBlock_3D_single_deform_LKA",
])
def test_forward_shapes(trans_block, depths=None):
    img, ncls = (16, 32, 32), 4
    model, variables, x = _build(trans_block, img=img, ncls=ncls,
                                 depths=depths)
    outs = model.apply(variables, x)
    assert len(outs) == 3
    assert outs[0].shape == (1, *img, ncls)
    assert outs[1].shape == (1, img[0] // 2, img[1] // 4, img[2] // 4, ncls)
    assert outs[2].shape == (1, img[0] // 4, img[1] // 8, img[2] // 8, ncls)
    assert np.isfinite(np.asarray(outs[0])).all()


def test_param_count_synapse_flagship():
    """Published 3D D-LKA Net: 42.35 M params (BASELINE.md, Synapse_3D)."""
    model = DLKAFormer(out_channels=14, img_size=(64, 128, 128),
                       patch_size=(2, 4, 4), do_ds=True,
                       trans_block="TransformerBlock_3D_single_deform_LKA")
    x = jnp.zeros((1, 64, 128, 128, 1), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x))
    n = sum(int(np.prod(v.shape)) for v in
            jax.tree_util.tree_leaves(variables["params"]))
    assert 40e6 < n < 45e6, f"param count {n/1e6:.2f}M vs published 42.35M"


@pytest.mark.slow
def test_generic_unet_shapes_and_plans():
    """GenericUNet (generic_UNet.py baseline): DS output pyramid + plans
    construction."""
    from deformablelka_tpu.models.generic_unet import (
        GenericUNet, generic_unet_3d_from_plans)

    m = GenericUNet(num_classes=4, num_pool=3, base_num_features=8)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 1)))
    outs = m.apply(v, jnp.zeros((1, 16, 16, 16, 1)))
    assert [o.shape for o in outs] == [(1, 16, 16, 16, 4),
                                       (1, 8, 8, 8, 4), (1, 4, 4, 4, 4)]
    # anisotropic pooling from a plans stage
    stage = {"pool_op_kernel_sizes": [[1, 2, 2], [2, 2, 2]],
             "conv_kernel_sizes": [[1, 3, 3], [3, 3, 3], [3, 3, 3]]}
    m2 = generic_unet_3d_from_plans(stage, num_classes=2, do_ds=False)
    v2 = m2.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 1)))
    out = m2.apply(v2, jnp.zeros((1, 8, 16, 16, 1)))
    assert out.shape == (1, 8, 16, 16, 2)


@pytest.mark.slow
def test_pancreas_baselines_shapes():
    """VNet / Resnet34Seg / UNETR (pancreas baseline zoo,
    3D/pancreas_code/networks/{vnet,ResNet34,unetr}.py)."""
    from deformablelka_tpu.models.pancreas_baselines import (
        VNet, Resnet34Seg, UNETR)

    x = jnp.zeros((1, 16, 16, 16, 1))
    v = VNet(n_classes=2, n_filters=4)
    out = v.apply(v.init(jax.random.PRNGKey(0), x), x)
    assert out.shape == (1, 16, 16, 16, 2)
    r = Resnet34Seg(n_classes=3)
    out = r.apply(r.init(jax.random.PRNGKey(0), x), x)
    assert out.shape == (1, 16, 16, 16, 3)
    x32 = jnp.zeros((1, 32, 32, 32, 1))
    u = UNETR(n_classes=2, img_size=(32, 32, 32), feature_size=2,
              hidden=48, mlp_dim=96, heads=4)
    out = u.apply(u.init(jax.random.PRNGKey(0), x32), x32)
    assert out.shape == (1, 32, 32, 32, 2)


@pytest.mark.slow
def test_remat_grad_parity():
    """nn.remat'd blocks must give identical gradients (jax.checkpoint
    is semantics-preserving; it only trades recompute for activation
    memory — needed because a batch-2 train step at the Synapse patch
    exceeds one chip's HBM without it, PERF.md).

    slow: ~5 min on the 1-core CPU box (full-model value_and_grad
    compile twice); (16,32,32) is already the minimum 4-stage size."""
    from deformablelka_tpu.models.dlka_former import dlka_former_synapse
    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 32, 32, 1),
                    jnp.float32)
    m0 = dlka_former_synapse(num_classes=2, do_ds=False,
                             img_size=(16, 32, 32), remat=False)
    m1 = dlka_former_synapse(num_classes=2, do_ds=False,
                             img_size=(16, 32, 32), remat=True)
    v = jax.jit(m0.init)(jax.random.PRNGKey(0), x)

    def loss_fn(m):
        def f(params):
            out = m.apply({"params": params,
                           **({"batch_stats": v["batch_stats"]}
                              if "batch_stats" in v else {})}, x,
                          mutable=["batch_stats"])
            return jnp.sum(out[0].astype(jnp.float32) ** 2)
        return f

    g0 = jax.grad(loss_fn(m0))(v["params"])
    g1 = jax.grad(loss_fn(m1))(v["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(b, a, atol=1e-5)
