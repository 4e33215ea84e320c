"""End-to-end pipeline test on a synthetic decathlon-style dataset:
plan_and_preprocess → DataLoader → Predictor3D → export → evaluate."""

import json
import numpy as np
import jax.numpy as jnp

from deformablelka_tpu.data import nifti
from deformablelka_tpu.data.experiment_planning import (
    plan_and_preprocess, verify_dataset_integrity)
from deformablelka_tpu.data.plans import PlansConfig
from deformablelka_tpu.data.preprocessing import GenericPreprocessor
from deformablelka_tpu.inference.predictor3d import (
    Predictor3D, restore_softmax_to_original, predict_from_folder)


def _make_raw_dataset(root, n=2, shape=(20, 24, 24)):
    (root / "imagesTr").mkdir(parents=True)
    (root / "labelsTr").mkdir(parents=True)
    (root / "dataset.json").write_text(json.dumps({
        "modality": {"0": "CT"},
        "labels": {"0": "background", "1": "organ"}}))
    aff = np.diag([4.0, 1.0, 1.0, 1.0])
    for i in range(n):
        rng = np.random.RandomState(i)
        img = np.zeros(shape, np.float32)
        img[3:18, 4:20, 4:20] = rng.rand(15, 16, 16) * 300 - 50
        lab = np.zeros(shape, np.int16)
        lab[8:12, 8:16, 8:16] = 1
        nifti.save(img, root / "imagesTr" / f"case_{i:03d}_0000.nii.gz",
                   affine=aff)
        nifti.save(lab, root / "labelsTr" / f"case_{i:03d}.nii.gz",
                   affine=aff)


def test_plan_and_preprocess(tmp_path):
    raw = tmp_path / "raw"
    out = tmp_path / "pre"
    _make_raw_dataset(raw)
    assert verify_dataset_integrity(raw) == []
    plans = plan_and_preprocess(raw, out)
    assert (out / "plans_3D.pkl").exists()
    assert (out / "case_000.npz").exists()
    assert (out / "case_000.pkl").exists()
    cfg = PlansConfig.from_plans(plans)
    assert cfg.num_classes == 2  # organ + bg
    assert cfg.intensity_properties[0]["percentile_99_5"] > 0
    arr = np.load(out / "case_000.npz")["data"]
    assert arr.shape[0] == 2  # data + seg


def test_restore_softmax_geometry():
    props = {"original_shape": (10, 12, 12),
             "crop_bbox": [[2, 8], [3, 11], [3, 11]],
             "original_spacing": [1, 1, 1],
             "target_spacing": [1, 1, 1]}
    softmax = np.zeros((6, 8, 8, 2), np.float32)
    softmax[..., 1] = 1.0  # all foreground inside crop
    seg = restore_softmax_to_original(softmax, props)
    assert seg.shape == (10, 12, 12)
    assert seg[2:8, 3:11, 3:11].min() == 1
    assert seg[0].max() == 0


def test_predictor3d_end_to_end(tmp_path):
    """Trivial 'model' (mean-threshold) through the full file pipeline."""
    def apply_fn(params, x):
        m = jnp.mean(x, axis=-1, keepdims=True)
        return jnp.concatenate([-m, m], axis=-1)

    pre = GenericPreprocessor(
        normalization_schemes=["nonCT"], use_nonzero_mask=[False],
        target_spacing=[2.0, 1.0, 1.0])
    predictor = Predictor3D(apply_fn, [{}], pre, patch_size=(8, 16, 16),
                            num_classes=2, do_mirroring=False)
    rng = np.random.RandomState(0)
    img = rng.rand(12, 20, 20).astype(np.float32) * 100 + 10
    src = tmp_path / "in"
    dst = tmp_path / "out"
    src.mkdir()
    nifti.save(img, src / "c1_0000.nii.gz",
               affine=np.diag([4.0, 1.0, 1.0, 1.0]))
    results = predict_from_folder(predictor, src, dst)
    assert len(results) == 1
    seg = nifti.load(results[0]).data
    assert seg.shape == (12, 20, 20)
    assert set(np.unique(seg)).issubset({0, 1})
