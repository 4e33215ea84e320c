"""Ablation model zoo: DAEFormer, SegFormer, SwinUNet shape tests."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_daeformer_shapes():
    from deformablelka_tpu.models.daeformer import DAEFormer
    m = DAEFormer(num_classes=9, dims=(32, 80, 128), layers=(1, 1, 1))
    x = jnp.zeros((1, 224, 224, 1))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (1, 224, 224, 9)


@pytest.mark.slow
def test_segformer_shapes():
    from deformablelka_tpu.nn.segformer import SegFormer
    m = SegFormer(num_classes=9, dims=(16, 32, 80, 128),
                  layers=(1, 1, 1, 1), embed_dim=32)
    x = jnp.zeros((1, 224, 224, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x, mutable=["batch_stats"])[0]
    assert out.shape == (1, 224, 224, 9)


@pytest.mark.slow
def test_swinunet_shapes():
    from deformablelka_tpu.models.swinunet import SwinUNet
    m = SwinUNet(num_classes=4, img_size=224, embed_dim=24,
                 depths=(1, 1, 1, 1), num_heads=(2, 2, 4, 4))
    x = jnp.zeros((1, 224, 224, 1))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (1, 224, 224, 4)


def test_swin_window_roundtrip():
    from deformablelka_tpu.models.swinunet import (
        window_partition, window_reverse, shift_mask,
        relative_position_index)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 14, 14, 8))
    w = window_partition(x, 7)
    assert w.shape == (2 * 4, 49, 8)
    back = window_reverse(w, 7, 14, 14)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    m = shift_mask(14, 14, 7, 3)
    assert m.shape == (4, 49, 49)
    assert set(np.unique(np.asarray(m))).issubset({0.0, -100.0})
    idx = relative_position_index(7)
    assert idx.shape == (49, 49)
    assert idx.max() == (2 * 7 - 1) ** 2 - 1


@pytest.mark.slow
def test_dat_lka_shapes_and_grid_sample():
    from deformablelka_tpu.models.dat_lka import DATLKAFormer
    m = DATLKAFormer(num_classes=9, dims=(16, 32, 64, 128),
                     depths=(1, 1, 2, 1), heads=(2, 2, 4, 4),
                     groups=(1, 1, 2, 2), stage_spec=("D", "L", "LD", "D"))
    x = jnp.zeros((1, 224, 224, 1))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (1, 224, 224, 9)


def test_grid_sample_matches_torch():
    import pytest
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from deformablelka_tpu.ops.deform2d import grid_sample_bilinear

    rng = np.random.RandomState(0)
    x = rng.randn(2, 7, 9, 3).astype(np.float32)
    grid = rng.uniform(-1.2, 1.2, (2, 5, 6, 2)).astype(np.float32)
    ours = np.asarray(grid_sample_bilinear(jnp.asarray(x),
                                           jnp.asarray(grid)))
    ref = F.grid_sample(torch.tensor(x).permute(0, 3, 1, 2),
                        torch.tensor(grid), mode="bilinear",
                        align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
