"""Model selection / ensembling + model restore tests."""

import json
from pathlib import Path

import numpy as np
import pytest

from deformablelka_tpu.evaluation.model_selection import (
    merge_softmax, merge_npz_case, ensemble_validation_folders,
    rank_candidates, summarize_results_in_one_json)
from deformablelka_tpu.inference.model_restore import (
    save_model_config, restore_model, load_model_and_checkpoint_files)


def test_merge_softmax_mean():
    a = np.zeros((2, 4, 4, 4)); a[1] = 1.0
    b = np.ones((2, 4, 4, 4)) * 0.5
    m = merge_softmax([a, b])
    assert m.shape == a.shape
    assert m[0, 0, 0, 0] == pytest.approx(0.25)
    assert m[1, 0, 0, 0] == pytest.approx(0.75)


def _write_val_folder(root, fold, cases, ncls=3, shape=(6, 6, 6), seed=0):
    rng = np.random.RandomState(seed)
    v = Path(root) / f"fold_{fold}" / "validation_raw"
    v.mkdir(parents=True)
    for c in cases:
        sm = rng.rand(ncls, *shape).astype(np.float32)
        sm /= sm.sum(0, keepdims=True)
        np.savez(v / f"{c}.npz", softmax=sm)
    return v


def test_ensemble_validation_folders(tmp_path):
    from deformablelka_tpu.data import nifti
    cases = ["caseA", "caseB"]
    _write_val_folder(tmp_path / "net1", 0, cases, seed=1)
    _write_val_folder(tmp_path / "net2", 0, cases, seed=2)
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    rng = np.random.RandomState(0)
    for c in cases:
        nifti.save(rng.randint(0, 3, size=(6, 6, 6)).astype(np.uint8),
                   gt_dir / f"{c}.nii.gz")
    summary = ensemble_validation_folders(
        tmp_path / "net1", tmp_path / "net2", tmp_path / "ens", gt_dir,
        labels=[1, 2], folds=(0,), run_postprocessing=True)
    assert (tmp_path / "ens" / "ensembled_raw" / "caseA.nii.gz").exists()
    assert (tmp_path / "ens" / "ensembled_raw" / "summary.json").exists()
    assert (tmp_path / "ens" / "postprocessing.json").exists()
    assert "mean" in summary["results"]


def test_ensemble_mismatched_cases_raises(tmp_path):
    _write_val_folder(tmp_path / "net1", 0, ["caseA"])
    _write_val_folder(tmp_path / "net2", 0, ["caseB"])
    with pytest.raises(AssertionError):
        ensemble_validation_folders(tmp_path / "net1", tmp_path / "net2",
                                    tmp_path / "ens", tmp_path,
                                    labels=[1], folds=(0,))


def _fake_summary(path, name, dices):
    mean = {str(i + 1): {"Dice": d} for i, d in enumerate(dices)}
    mean["0"] = {"Dice": 0.99}  # background must be excluded
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps({"name": name, "results": {"mean": mean}}))


def test_rank_candidates_and_summarize(tmp_path):
    _fake_summary(tmp_path / "exp_a" / "summary.json", "a", [0.5, 0.6])
    _fake_summary(tmp_path / "exp_b" / "summary.json", "b", [0.8, 0.9])
    files = [tmp_path / "exp_a" / "summary.json",
             tmp_path / "exp_b" / "summary.json"]
    ranked = rank_candidates(files, out_csv=tmp_path / "rank.csv")
    assert ranked[0]["experiment"] == "b"
    assert ranked[0]["mean_fg_dice"] == pytest.approx(0.85)
    assert ranked[1]["mean_fg_dice"] == pytest.approx(0.55)
    assert (tmp_path / "rank.csv").read_text().startswith("experiment")
    out = summarize_results_in_one_json(files, tmp_path / "all.json")
    assert out["b"] == pytest.approx(0.85)


class _TinyFactoryModel:
    pass


@pytest.mark.slow
def test_model_restore_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from deformablelka_tpu.training.checkpoint import CheckpointManager

    run = tmp_path / "fold_0"
    save_model_config(run, "dlka_net_pancreas",
                      {"num_classes": 2, "img_size": (16, 16, 16),
                       "trans_block": "TransformerBlock"},
                      example_shape=(16, 16, 16, 1))
    from deformablelka_tpu.models import dlka_net_pancreas
    model = dlka_net_pancreas(num_classes=2, img_size=(16, 16, 16),
                              trans_block="TransformerBlock")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 16, 1)))
    ckpt = {"params": variables["params"]}
    if "batch_stats" in variables:
        ckpt["batch_stats"] = variables["batch_stats"]
    CheckpointManager(run).save("model_final_checkpoint", ckpt)

    m2, v2 = restore_model(run)
    out = m2.apply(v2, jnp.zeros((1, 16, 16, 16, 1)))
    if isinstance(out, (list, tuple)):
        out = out[0]
    assert out.shape == (1, 16, 16, 16, 2)

    m3, per_fold = load_model_and_checkpoint_files(tmp_path, folds=(0,))
    assert len(per_fold) == 1
