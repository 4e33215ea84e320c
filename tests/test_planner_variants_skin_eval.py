"""Alternative experiment-planner variants + skin notebook-equivalent eval."""

import numpy as np
import pytest

from deformablelka_tpu.data.experiment_planning import (
    PLANNER_VARIANTS, ExperimentPlanner, make_planner)
from deformablelka_tpu.data.preprocessing import (
    GenericPreprocessor, ct2_normalize)
from deformablelka_tpu.evaluation.skin_eval import (
    binary_pixel_metrics, evaluate_skin_predictions, postprocess_skin_mask)


def _fingerprint(aniso=True):
    rng = np.random.RandomState(0)
    n = 6
    if aniso:
        spacings = np.stack([rng.uniform(3.0, 5.0, n),
                             np.full(n, 0.8), np.full(n, 0.8)], 1)
    else:
        spacings = np.full((n, 3), 1.0) + rng.uniform(-0.1, 0.1, (n, 3))
    shapes = np.full((n, 3), 64) + rng.randint(0, 16, (n, 3))
    return {
        "spacings": spacings.tolist(),
        "shapes": shapes.tolist(),
        "all_classes": [1, 2],
        "modalities": {"0": "CT"},
        "intensityproperties": {0: {
            "percentile_00_5": -100.0, "percentile_99_5": 200.0,
            "mean": 40.0, "sd": 50.0, "median": 40.0, "mn": -200.0,
            "mx": 400.0}},
    }


def test_all_planner_variants_produce_plans():
    fp = _fingerprint()
    for name in PLANNER_VARIANTS:
        plans = make_planner(fp, name).plan()
        st = plans["plans_per_stage"][0]
        assert len(st["patch_size"]) == 3
        assert all(v > 0 for v in st["patch_size"]), name
        assert len(st["pool_op_kernel_sizes"]) == 3


def test_memory_budget_scales_patch():
    fp = _fingerprint(aniso=False)
    # big enough dataset shapes so the budget binds
    fp["shapes"] = (np.full((6, 3), 256)).tolist()
    small = make_planner(fp, "baseline").plan(max_patch_voxels=32 ** 3)
    big = make_planner(fp, "v21_32GB").plan(max_patch_voxels=32 ** 3)
    assert (np.prod(big["plans_per_stage"][0]["patch_size"])
            > np.prod(small["plans_per_stage"][0]["patch_size"]))


def test_iso_and_custom_target_spacing():
    fp = _fingerprint()
    iso = make_planner(fp, "isotropic_in_mm").plan()
    sp = iso["plans_per_stage"][0]["current_spacing"]
    assert len(set(np.round(sp, 6))) == 1
    custom = make_planner(fp, "customTargetSpacing_2x2x2").plan()
    assert custom["plans_per_stage"][0]["current_spacing"] == [2.0, 2.0, 2.0]


def test_pool_based_on_spacing_skips_coarse_axis():
    fp = _fingerprint(aniso=True)
    p = ExperimentPlanner(fp, target_spacing_mode="median",
                          pool_based_on_spacing=True).plan()
    pools = p["plans_per_stage"][0]["pool_op_kernel_sizes"]
    # axis 0 spacing ~4 mm vs 0.8 mm: must not pool in the first level
    assert pools[0][0] == 1 and pools[0][1] == 2


def test_normalization_override_in_plans():
    fp = _fingerprint()
    p = make_planner(fp, "CT2").plan()
    assert p["normalization_schemes"][0] == "CT2"
    # conv/residual knobs flow through
    assert make_planner(fp, "3convperstage").plan()["conv_per_stage"] == 3
    assert make_planner(fp, "residual").plan()["residual"] is True


def test_ct2_and_rgb_preprocessing():
    rng = np.random.RandomState(0)
    data = rng.uniform(-200, 400, (1, 8, 8, 8)).astype(np.float32)
    out = ct2_normalize(data[0], -100.0, 200.0)
    assert abs(out.mean()) < 0.5  # per-case z-score of in-range voxels
    pre = GenericPreprocessor(["rgb01"], [False], [1.0, 1.0, 1.0])
    d = rng.uniform(0, 255, (1, 8, 8, 8)).astype(np.float32)
    seg = np.zeros((1, 8, 8, 8), np.float32)
    d2, _, _ = pre.preprocess(d, [1.0, 1.0, 1.0], seg)
    assert 0.0 <= d2.min() and d2.max() <= 1.0


@pytest.mark.slow
def test_residual_generic_unet_forward():
    import jax
    import jax.numpy as jnp
    from deformablelka_tpu.models.generic_unet import GenericUNet
    net = GenericUNet(num_classes=3, num_pool=2, base_num_features=4,
                      do_ds=False, conv_per_stage=3, residual=True)
    x = jnp.zeros((1, 8, 8, 8, 1))
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    y = jax.jit(net.apply)(params, x)
    assert y.shape == (1, 8, 8, 8, 3)


# --- skin eval ------------------------------------------------------------

def test_binary_pixel_metrics_exact():
    gt = np.array([[1, 1, 0, 0]])
    pr = np.array([[1, 0, 1, 0]])
    m = binary_pixel_metrics(gt, pr)
    assert m["tp"] == 1 and m["fn"] == 1 and m["fp"] == 1 and m["tn"] == 1
    assert m["accuracy"] == 0.5
    assert m["sensitivity"] == 0.5 and m["specificity"] == 0.5
    assert abs(m["f1"] - 0.5) < 1e-9  # 2·tp/(2·tp+fp+fn) = 2/4
    assert abs(m["jaccard"] - 1 / 3) < 1e-9


def test_postprocess_removes_specks_fills_holes():
    mask = np.zeros((40, 40), np.uint8)
    mask[5:25, 5:25] = 1
    mask[12:15, 12:15] = 0   # hole → filled
    mask[35, 35] = 1         # speck → opened away
    out = postprocess_skin_mask(mask, opening_size=3, fill_size=3)
    assert out[13, 13] == 1
    assert out[35, 35] == 0


def test_evaluate_skin_predictions_grid():
    rng = np.random.RandomState(0)
    gts, preds = [], []
    for _ in range(3):
        gt = np.zeros((32, 32), np.float32)
        gt[8:24, 8:24] = 1
        prob = gt * 0.9 + rng.rand(32, 32).astype(np.float32) * 0.2
        gts.append(gt)
        preds.append(prob)
    res = evaluate_skin_predictions(gts, preds, opening_sizes=(0, 3),
                                    fill_sizes=(0, 3))
    assert len(res["grid"]) == 4
    assert res["best"]["dsc"] >= max(g["dsc"] for g in res["grid"]) - 1e-12
    assert res["best"]["dsc"] > 0.9


def test_evaluate_skin_model_driver(tmp_path):
    # trivial "model": sigmoid of mean channel thresholded — just checks
    # the batched driver plumbing + visualization dump
    def apply_fn(params, x):
        return (x.mean(axis=-1, keepdims=True) > 0.5).astype("float32")

    items = []
    rng = np.random.RandomState(1)
    for _ in range(5):
        m = np.zeros((16, 16), np.float32)
        m[4:12, 4:12] = 1
        img = np.repeat(m[..., None], 3, -1) + rng.rand(16, 16, 3) * 0.1
        items.append({"image": img, "mask": m})

    from deformablelka_tpu.evaluation.skin_eval import evaluate_skin_model
    res = evaluate_skin_model(apply_fn, None, items, batch_size=2,
                              opening_sizes=(0,), fill_sizes=(0,),
                              vis_dir=tmp_path / "vis", max_vis=2)
    assert res["best"]["dsc"] > 0.95
    assert (tmp_path / "vis" / "1" / "img_1.png").exists()
