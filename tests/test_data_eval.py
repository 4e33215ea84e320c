"""Tests: preprocessing, NIfTI IO, metrics, postprocessing, evaluator."""

import numpy as np
import pytest

from deformablelka_tpu.data.preprocessing import (
    crop_to_nonzero, resample_patient, ct_normalize, GenericPreprocessor,
    get_do_separate_z)
from deformablelka_tpu.data import nifti
from deformablelka_tpu.evaluation.metrics import (
    dice, jaccard, hd95, assd, ConfusionMatrix)
from deformablelka_tpu.evaluation.postprocessing import (
    largest_cc_only, determine_postprocessing)
from deformablelka_tpu.evaluation.evaluator import (
    aggregate_scores, remap_synapse_labels, evaluate_synapse_cases)


def test_crop_to_nonzero():
    data = np.zeros((1, 10, 10, 10), np.float32)
    data[0, 2:8, 3:7, 4:9] = 1.0
    seg = np.zeros((1, 10, 10, 10), np.int16)
    d, s, bbox = crop_to_nonzero(data, seg)
    assert d.shape == (1, 6, 4, 5)
    assert bbox == [[2, 8], [3, 7], [4, 9]]
    assert (s == 0).all()  # all inside mask


def test_resample_shapes_and_separate_z():
    assert get_do_separate_z([5.0, 1.0, 1.0])
    assert not get_do_separate_z([1.5, 1.0, 1.0])
    data = np.random.RandomState(0).randn(1, 8, 16, 16).astype(np.float32)
    seg = np.random.RandomState(1).randint(0, 3, (1, 8, 16, 16)).astype(np.int16)
    d, s = resample_patient(data, seg, [4.0, 1.0, 1.0], [2.0, 1.0, 1.0])
    assert d.shape == (1, 16, 16, 16)
    assert s.shape == (1, 16, 16, 16)
    assert set(np.unique(s)).issubset({0, 1, 2})


def test_ct_normalize():
    x = np.array([-500.0, 0.0, 500.0, 2000.0])
    y = ct_normalize(x, -100, 300, 100, 50)
    np.testing.assert_allclose(y, [(-100 - 100) / 50, -2.0, 4.0, 4.0])


def test_generic_preprocessor_roundtrip():
    rng = np.random.RandomState(0)
    data = np.zeros((1, 12, 20, 20), np.float32)
    data[0, 2:10, 4:16, 4:16] = rng.rand(8, 12, 12) * 400 - 100
    pp = GenericPreprocessor(
        normalization_schemes=["CT"], use_nonzero_mask=[False],
        target_spacing=[2.0, 1.0, 1.0],
        intensity_properties={0: {"percentile_00_5": -90,
                                  "percentile_99_5": 290,
                                  "mean": 100, "sd": 50}})
    d, s, props = pp.preprocess(data, [4.0, 1.0, 1.0])
    assert d.shape[0] == 1 and d.ndim == 4
    assert props["crop_bbox"][0] == [2, 10]


def test_nifti_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    vol = (rng.rand(7, 9, 11) * 100).astype(np.float32)
    aff = np.diag([1.5, 2.0, 2.5, 1.0])
    p = tmp_path / "x.nii.gz"
    nifti.save(nifti.NiftiImage(vol, aff), p)
    img = nifti.load(p)
    np.testing.assert_allclose(img.data, vol, rtol=1e-6)
    np.testing.assert_allclose(img.affine[:3, :3], aff[:3, :3])
    assert img.spacing == (1.5, 2.0, 2.5)
    # int16 segmentation path
    seg = rng.randint(0, 5, (4, 5, 6)).astype(np.int16)
    p2 = tmp_path / "seg.nii"
    nifti.save(seg, p2, affine=np.eye(4))
    np.testing.assert_array_equal(nifti.load(p2).data, seg)


def test_metrics_known_values():
    a = np.zeros((10, 10, 10), bool)
    b = np.zeros((10, 10, 10), bool)
    a[2:6] = True
    b[4:8] = True
    # |a|=|b|=400, overlap=200 → dice 0.5, jaccard 1/3
    assert np.isclose(dice(a, b), 0.5)
    assert np.isclose(jaccard(a, b), 1 / 3)
    cm = ConfusionMatrix(a, b)
    assert cm.tp == 200 and np.isclose(cm.dice(), 0.5)
    # identical masks → zero distances
    assert hd95(a, a) == 0.0
    assert assd(a, a) == 0.0
    # shifted slabs: surfaces 2 apart along x at most
    h = hd95(a, b)
    assert 1.0 <= h <= 4.0


def test_hd95_with_spacing():
    a = np.zeros((10, 10, 10), bool)
    b = np.zeros((10, 10, 10), bool)
    a[5, 5, 5] = True
    b[5, 5, 7] = True
    assert np.isclose(hd95(a, b, (1, 1, 1)), 2.0)
    assert np.isclose(hd95(a, b, (1, 1, 3.0)), 6.0)


def test_largest_cc():
    seg = np.zeros((10, 10, 10), np.int32)
    seg[1:5, 1:5, 1:5] = 1          # big component (64)
    seg[8, 8, 8] = 1                # small speck
    out, removed, kept = largest_cc_only(seg, [1])
    assert out[8, 8, 8] == 0
    assert out[2, 2, 2] == 1
    assert kept[1] == 64.0


def test_determine_postprocessing():
    gt = np.zeros((10, 10, 10), np.int32)
    gt[1:5, 1:5, 1:5] = 1
    pred = gt.copy()
    pred[8, 8, 8] = 1  # false-positive speck that CC filtering removes
    res = determine_postprocessing([(pred, gt)], [1])
    assert res["for_which_classes"] == [1]


def test_evaluator_and_synapse_remap(tmp_path):
    gt = np.zeros((8, 8, 8), np.int32)
    gt[2:5] = 11  # pancreas raw label
    pred = gt.copy()
    remapped = remap_synapse_labels(gt)
    assert set(np.unique(remapped)) == {0, 8}
    summary = evaluate_synapse_cases([(pred, gt)],
                                     out_file=tmp_path / "s.json")
    assert np.isclose(summary["results"]["mean"]["8"]["Dice"], 1.0)
    assert (tmp_path / "s.json").exists()


def test_normalized_surface_dice():
    from deformablelka_tpu.evaluation.metrics import (
        normalized_surface_dice)
    a = np.zeros((12, 12, 12), bool)
    a[3:9, 3:9, 3:9] = True
    assert abs(normalized_surface_dice(a, a, 1.0) - 1.0) < 1e-6
    b = np.zeros_like(a)
    b[4:10, 3:9, 3:9] = True  # shifted by 1 voxel
    nsd1 = normalized_surface_dice(a, b, 1.0)
    nsd0 = normalized_surface_dice(a, b, 0.5)
    assert nsd1 > nsd0  # looser tolerance admits the 1-voxel shift
    assert nsd1 > 0.9
    import math
    assert math.isnan(normalized_surface_dice(a, np.zeros_like(a), 1.0))


def test_region_based_evaluation(tmp_path):
    from deformablelka_tpu.data import nifti
    from deformablelka_tpu.evaluation.region_based import (
        create_region_from_mask, evaluate_case_regions, evaluate_regions,
        get_brats_regions, get_kits_regions)
    gt = np.zeros((10, 10, 10), np.int16)
    gt[2:5] = 1
    gt[5:7] = 2
    gt[7:8] = 3
    pred = gt.copy()
    pred[7:8] = 2  # enhancing tumor mispredicted as core
    m = create_region_from_mask(gt, (2, 3))
    assert m.sum() == (gt >= 2).sum()
    res = evaluate_case_regions(pred, gt, list(get_brats_regions().values()))
    assert res[0] == 1.0            # whole tumor identical
    assert res[1] == 1.0            # tumor core {2,3} identical as a set
    assert res[2] == 0.0            # enhancing tumor empty in pred
    assert len(get_kits_regions()) == 2
    # folder mode + csv
    (tmp_path / "pred").mkdir()
    (tmp_path / "gt").mkdir()
    nifti.save(pred, tmp_path / "pred" / "c1.nii.gz")
    nifti.save(gt, tmp_path / "gt" / "c1.nii.gz")
    s = evaluate_regions(tmp_path / "pred", tmp_path / "gt",
                         get_brats_regions(),
                         out_csv=tmp_path / "summary.csv")
    assert s["whole tumor"]["mean"] == 1.0
    assert (tmp_path / "summary.csv").exists()
