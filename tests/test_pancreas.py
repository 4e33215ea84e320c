"""Pancreas pipeline: stride step grid parity, count blending, loader
crop/pad semantics, trainer smoke, metric asd."""

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp
import pytest

from deformablelka_tpu.inference.sliding_window import (
    SlidingWindowInference, compute_steps_stride)
from deformablelka_tpu.inference.pancreas import (
    make_pancreas_sliding_window, calculate_metric_percase)
from deformablelka_tpu.inference.pancreas import (
    test_single_case as run_single_case, test_all_case as run_all_cases)
from deformablelka_tpu.data.pancreas import (
    random_crop, center_crop, PancreasDataLoader)
from deformablelka_tpu.training.trainer_pancreas import (
    TrainerPancreas, binary_dice_loss, pancreas_loss,
    make_step_decay_schedule)


def _reference_stride_steps(size, patch, stride):
    """test_util.py:75-85 re-derived for one dim."""
    import math
    s = math.ceil((size - patch) / stride) + 1
    return [min(stride * x, size - patch) for x in range(s)]


def test_stride_grid_matches_reference_formula():
    patch = (96, 96, 96)
    img = (160, 180, 97)
    steps = compute_steps_stride(patch, img, 16, 16)
    for d in range(3):
        assert steps[d] == _reference_stride_steps(img[d], patch[d], 16)
    # size == patch → single origin 0
    assert compute_steps_stride(patch, patch, 16, 16) == [[0], [0], [0]]


class TinySeg(nn.Module):
    ncls: int = 2

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(4, (3, 3, 3))(x)
        return nn.Conv(self.ncls, (1, 1, 1))(nn.relu(h))


def test_count_blending_uniform():
    """With count blending and a constant-output model the stitched
    probability must be exactly the single-tile softmax everywhere
    (duplicated clamped origins must normalise out)."""
    model = TinySeg()
    patch = (8, 8, 8)
    x0 = jnp.zeros((1, *patch, 1))
    variables = model.init(jax.random.PRNGKey(0), x0)

    def apply_fn(v, x):
        return model.apply(v, x * 0)  # constant logits

    sw = make_pancreas_sliding_window(apply_fn, num_classes=2,
                                      patch_size=patch, stride_xy=3,
                                      stride_z=3)
    vol = np.random.RandomState(0).randn(13, 11, 8).astype(np.float32)
    pred, score = run_single_case(sw, variables, vol)
    assert pred.shape == vol.shape
    assert score.shape == (2, *vol.shape)
    # constant model → probabilities spatially constant after blending
    assert np.allclose(score[0], score[0].flat[0], atol=1e-5)
    assert np.allclose(score.sum(0), 1.0, atol=1e-5)


def test_random_crop_pads_small_volumes():
    rng = np.random.RandomState(0)
    img = rng.randn(10, 30, 30).astype(np.float32)
    lab = (img > 0).astype(np.int32)
    ci, cl = random_crop(img, lab, (16, 16, 16), rng)
    assert ci.shape == (16, 16, 16) and cl.shape == (16, 16, 16)
    ci2, cl2 = center_crop(img, lab, (16, 16, 16))
    assert ci2.shape == (16, 16, 16)


def test_metric_percase_perfect_prediction():
    gt = np.zeros((12, 12, 12), bool)
    gt[3:9, 3:9, 3:9] = True
    d, j, h, a = calculate_metric_percase(gt, gt)
    assert d == pytest.approx(1.0)
    assert j == pytest.approx(1.0)
    assert h == pytest.approx(0.0)
    assert a == pytest.approx(0.0)


def test_binary_dice_and_loss():
    logits = jnp.array(np.random.RandomState(0).randn(2, 4, 4, 4, 2),
                       jnp.float32)
    labels = jnp.array((np.random.RandomState(1).rand(2, 4, 4, 4) > 0.5)
                       .astype(np.int32))
    loss, (ce, dl) = pancreas_loss(logits, labels, labeled_bs=1)
    assert np.isfinite(float(loss))
    assert float(loss) == pytest.approx(float(ce) + float(dl), rel=1e-5)
    # perfect probabilities → dice loss ≈ 0
    perfect = labels.astype(jnp.float32)
    assert float(binary_dice_loss(perfect, labels)) == pytest.approx(
        0.0, abs=1e-4)


def test_step_decay_schedule():
    sched = make_step_decay_schedule(0.01, decay_every=10)
    assert float(sched(0)) == pytest.approx(0.01)
    assert float(sched(10)) == pytest.approx(0.001)
    assert float(sched(20)) == pytest.approx(0.0001)


class _ToyLoader:
    def __init__(self, seed=0):
        self.rng = np.random.RandomState(seed)

    def next_batch(self):
        data = self.rng.randn(2, 8, 8, 8, 1).astype(np.float32)
        target = (data[..., 0] > 0).astype(np.int32)
        return {"data": data, "target": target}


def test_trainer_pancreas_smoke(tmp_path):
    tr = TrainerPancreas(TinySeg(), tmp_path, max_iterations=6,
                         labeled_bs=1)
    state = tr.run_training(_ToyLoader(), log_every=0)
    assert int(state.step) == 6
    assert (tmp_path / "d_lka_former_iter_6").exists()


def test_pancreas_test_all_case_in_memory():
    model = TinySeg()
    patch = (8, 8, 8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *patch, 1)))

    def apply_fn(v, x):
        return model.apply(v, x)

    sw = make_pancreas_sliding_window(apply_fn, num_classes=2,
                                      patch_size=patch, stride_xy=4,
                                      stride_z=4)
    rng = np.random.RandomState(0)
    cases = [(f"case{i}", rng.randn(10, 10, 10).astype(np.float32),
              (rng.rand(10, 10, 10) > 0.5).astype(np.int32))
             for i in range(2)]
    avg = run_all_cases(sw, variables, cases, verbose=False)
    assert avg.shape == (4,)
    assert np.all(np.isfinite(avg))
