"""Aux-surface tests: decathlon conversion, DA variants, plans tools,
overlays, results collection."""

import json
import numpy as np
import pytest

from deformablelka_tpu.data import nifti


def test_split_4d_and_convert_decathlon(tmp_path):
    from deformablelka_tpu.data.convert_tasks import (
        convert_decathlon_task, split_4d_nifti)
    task = tmp_path / "Task05_Toy"
    (task / "imagesTr").mkdir(parents=True)
    (task / "imagesTs").mkdir()
    (task / "labelsTr").mkdir()
    rng = np.random.RandomState(0)
    img4d = rng.rand(6, 7, 8, 2).astype(np.float32)
    lab = (rng.rand(6, 7, 8) > 0.7).astype(np.int16)
    nifti.save(img4d, task / "imagesTr" / "toy_001.nii.gz")
    nifti.save(img4d[..., :1], task / "imagesTs" / "toy_002.nii.gz")
    nifti.save(lab, task / "labelsTr" / "toy_001.nii.gz")
    (task / "dataset.json").write_text(json.dumps(
        {"modality": {"0": "CT", "1": "MR"}, "labels": {"0": "bg"}}))
    out = convert_decathlon_task(task)
    assert out.name == "Task005_Toy"
    assert (out / "imagesTr" / "toy_001_0000.nii.gz").exists()
    assert (out / "imagesTr" / "toy_001_0001.nii.gz").exists()
    assert (out / "labelsTr" / "toy_001.nii.gz").exists()
    m0 = nifti.load(out / "imagesTr" / "toy_001_0000.nii.gz").data
    assert np.allclose(m0, img4d[..., 0], atol=1e-6)
    # 4D split helper alone
    outs = split_4d_nifti(task / "imagesTr" / "toy_001.nii.gz",
                          tmp_path / "split")
    assert len(outs) == 2


def test_convert_2d_image_to_nifti(tmp_path):
    from deformablelka_tpu.data.convert_tasks import (
        convert_2d_image_to_nifti)
    rgb = (np.random.RandomState(0).rand(10, 12, 3) * 255).astype(
        np.uint8)
    f = convert_2d_image_to_nifti(rgb, tmp_path / "img.nii.gz")
    assert f.name == "img_0000.nii.gz"
    assert (tmp_path / "img_0002.nii.gz").exists()
    arr = nifti.load(f).data
    assert arr.shape == (1, 10, 12)
    seg = (rgb[..., 0] > 128).astype(np.int16)
    fs = convert_2d_image_to_nifti(seg, tmp_path / "seg.nii.gz",
                                   is_seg=True)
    assert nifti.load(fs).data.shape == (1, 10, 12)


def test_da_variants():
    from deformablelka_tpu.data.augment import get_augmentation
    rng = np.random.RandomState(0)
    data = rng.rand(2, 24, 24, 24, 1).astype(np.float32)
    seg = np.zeros((2, 24, 24, 24), np.float32)
    seg[:, 8:16, 8:16, 8:16] = 1
    for variant in ("moreDA", "insaneDA", "noDA"):
        aug = get_augmentation(variant, (16, 16, 16),
                               rng=np.random.RandomState(1))
        out = aug({"data": data.copy(), "seg": seg.copy()})
        assert out["data"].shape == (2, 16, 16, 16, 1), variant
        assert out["target"].shape == (2, 16, 16, 16), variant
        assert set(np.unique(out["target"])) <= {0, 1}
    # noDA must be the exact centre crop (no intensity or mirror change)
    aug = get_augmentation("noDA", (16, 16, 16),
                           rng=np.random.RandomState(2))
    out = aug({"data": data.copy(), "seg": seg.copy()})
    assert np.allclose(out["data"][0, ..., 0], data[0, 4:20, 4:20, 4:20, 0])


def test_elastic_transform_runs():
    from deformablelka_tpu.data.augment import MoreDAAugmenter
    rng = np.random.RandomState(0)
    aug = MoreDAAugmenter((12, 12, 12), do_elastic=True, p_elastic=1.0,
                          do_mirror=False, do_intensity=False,
                          p_rot=0.0, p_scale=0.0,
                          rng=np.random.RandomState(3))
    data = rng.rand(1, 18, 18, 18, 1).astype(np.float32)
    seg = np.zeros((1, 18, 18, 18), np.float32)
    seg[:, 6:12, 6:12, 6:12] = 2
    out = aug({"data": data, "seg": seg})
    assert out["data"].shape == (1, 12, 12, 12, 1)
    assert set(np.unique(out["target"])) <= {0, 2}


def test_summarize_and_change_batch_size(tmp_path, capsys):
    import pickle
    from deformablelka_tpu.cli.tools import (change_batch_size,
                                             summarize_plans)
    plans = {"num_classes": 3, "num_modalities": 1,
             "normalization_schemes": {0: "CT"},
             "transpose_forward": [0, 1, 2],
             "plans_per_stage": {0: {"batch_size": 2,
                                     "patch_size": [64, 128, 128],
                                     "current_spacing": [1, 1, 1],
                                     "pool_op_kernel_sizes": [[2, 2, 2]]}}}
    pkl = tmp_path / "plans_3D.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(plans, f)
    summarize_plans([str(pkl)])
    out = capsys.readouterr().out
    assert "patch_size: [64, 128, 128]" in out
    change_batch_size([str(pkl), "7"])
    with open(pkl, "rb") as f:
        edited = pickle.load(f)
    assert edited["plans_per_stage"][0]["batch_size"] == 7


def test_overlay_and_folder(tmp_path):
    from deformablelka_tpu.utils.overlay import (
        generate_overlays_for_folder, overlay_image, save_overlay,
        select_slice)
    rng = np.random.RandomState(0)
    img = rng.rand(8, 16, 16).astype(np.float32)
    seg = np.zeros((8, 16, 16), np.int16)
    seg[5, 4:10, 4:10] = 1
    assert select_slice(seg) == 5
    rgb = overlay_image(img[5], seg[5])
    assert rgb.shape == (16, 16, 3) and rgb.dtype == np.uint8
    assert not np.all(rgb[6, 6] == rgb[0, 0])  # colored foreground
    p = save_overlay(img, seg, tmp_path / "o.png")
    assert p.exists()
    # folder mode
    (tmp_path / "imgs").mkdir()
    (tmp_path / "segs").mkdir()
    nifti.save(np.transpose(img, (1, 2, 0)),
               tmp_path / "imgs" / "case_0000.nii.gz")
    nifti.save(np.transpose(seg, (1, 2, 0)),
               tmp_path / "segs" / "case.nii.gz")
    written = generate_overlays_for_folder(tmp_path / "imgs",
                                           tmp_path / "segs",
                                           tmp_path / "ov")
    assert len(written) == 1 and written[0].exists()


def test_add_mean_dice_and_collect(tmp_path):
    from deformablelka_tpu.evaluation.evaluator import aggregate_scores
    from deformablelka_tpu.evaluation.model_selection import (
        add_mean_dice_to_json, collect_results_files)
    rng = np.random.RandomState(0)
    gt = (rng.rand(10, 10, 10) > 0.5).astype(np.int16)
    pred = gt.copy()
    pred[0] = 0
    run = tmp_path / "exp" / "fold_0" / "validation"
    run.mkdir(parents=True)
    aggregate_scores([(pred, gt)], labels=[0, 1],
                     json_output_file=run / "summary.json",
                     compute_surface=False)
    md = add_mean_dice_to_json(run / "summary.json")
    assert 0.8 < md <= 1.0
    with open(run / "summary.json") as f:
        assert "mean_dice" in json.load(f)["results"]
    copied = collect_results_files(tmp_path, tmp_path / "collected")
    assert len(copied) == 1
    assert "exp__fold_0__validation__summary.json" == copied[0].name
