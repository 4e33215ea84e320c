"""Skin data pipeline + ACDC evaluator tests."""

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp
import pytest

from deformablelka_tpu.data.skin import (
    dataset_normalized, boundary_extraction, prepare_skin_dataset,
    ISICLoader)
from deformablelka_tpu.evaluation.evaluator import evaluate_acdc_cases
from deformablelka_tpu.training.trainer2d import (
    ReduceLROnPlateau, TrainerSkin)


def test_dataset_normalized_semantics():
    rng = np.random.RandomState(0)
    imgs = rng.rand(4, 8, 8, 3) * 100
    out = dataset_normalized(imgs)
    # per-image range is exactly [0, 255] (loader.py:9-16)
    for i in range(4):
        assert out[i].min() == pytest.approx(0.0)
        assert out[i].max() == pytest.approx(255.0)


def test_boundary_extraction():
    m = np.zeros((16, 16))
    m[5:10, 5:10] = 1
    b = boundary_extraction(m)
    assert b.max() == 1 and b.min() == 0
    assert (b * m).sum() == 0  # boundary strictly outside the mask
    assert b.sum() > 0


def _write_skin_npys(tmp_path, n=8, hw=32):
    rng = np.random.RandomState(0)
    for split, k in (("train", n), ("val", 2), ("test", 2)):
        data = rng.rand(k, hw, hw, 3) * 255
        mask = (rng.rand(k, hw, hw) > 0.5).astype(np.float64) * 255
        np.save(tmp_path / f"data_{split}.npy", data)
        np.save(tmp_path / f"mask_{split}.npy", mask)


def test_isic_loader_batches(tmp_path):
    _write_skin_npys(tmp_path)
    ld = ISICLoader(tmp_path, "train", batch_size=3, with_boundary=True)
    batches = list(ld.epoch())
    assert len(batches) == 2  # 8 // 3, ragged tail dropped in training
    b = batches[0]
    assert b["image"].shape == (3, 32, 32, 3)
    assert b["mask"].shape == (3, 32, 32, 1)
    assert b["boundary"].shape == (3, 32, 32, 1)
    assert b["mask"].max() <= 1.0
    # eval keeps the ragged tail
    lv = ISICLoader(tmp_path, "val", batch_size=3)
    assert sum(x["image"].shape[0] for x in lv.epoch()) == 2


def test_prepare_skin_dataset_roundtrip(tmp_path):
    from PIL import Image
    imgs, masks = [], []
    rng = np.random.RandomState(0)
    for i in range(5):
        ip = tmp_path / f"img{i}.png"
        mp = tmp_path / f"img{i}_segmentation.png"
        Image.fromarray((rng.rand(40, 50, 3) * 255).astype(np.uint8)
                        ).save(ip)
        Image.fromarray((rng.rand(40, 50) * 255).astype(np.uint8)).save(mp)
        imgs.append(str(ip))
        masks.append(str(mp))
    out = prepare_skin_dataset(imgs, masks, tmp_path / "prep",
                               splits=(0.6, 0.2, 0.2), height=16, width=16)
    d = np.load(out / "data_train.npy")
    assert d.shape == (3, 16, 16, 3)
    assert np.load(out / "data_val.npy").shape[0] == 1
    assert np.load(out / "data_test.npy").shape[0] == 1


def test_reduce_lr_on_plateau():
    s = ReduceLROnPlateau(factor=0.5, patience=2)
    # improving: scale stays 1
    for v in (1.0, 0.9, 0.8):
        assert s.step(v) == 1.0
    # stagnating: after patience+1 bad epochs, halve
    assert s.step(0.8) == 1.0
    assert s.step(0.8) == 1.0
    assert s.step(0.8) == 0.5
    assert s.step(0.8) == 0.5


class TinyBin(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.Conv(4, (3, 3))(x)
        return nn.Conv(1, (1, 1))(nn.relu(h))


def test_trainer_skin_smoke(tmp_path):
    _write_skin_npys(tmp_path, n=4, hw=16)
    tr_ld = ISICLoader(tmp_path, "train", batch_size=2)
    vl_ld = ISICLoader(tmp_path, "val", batch_size=1)
    tr = TrainerSkin(TinyBin(), tmp_path / "out", base_lr=0.01,
                     max_epochs=2)
    state = tr.run_training(tr_ld, vl_ld, log_every=0)
    assert state is not None
    assert np.isfinite(tr.best_val_loss)
    assert (tmp_path / "out" / "best_model").exists()


def test_evaluate_acdc_cases(tmp_path):
    rng = np.random.RandomState(0)
    gt = rng.randint(0, 4, size=(12, 12, 12))
    pairs = [(gt, gt), (np.zeros_like(gt), gt)]
    s = evaluate_acdc_cases(pairs, out_file=tmp_path / "dice_pre.txt")
    # perfect case: dice 1 / hd 0 for all structures
    for k in ("rv", "myo", "lv"):
        assert s["per_structure"][k]["dice"][0] == pytest.approx(1.0)
        assert s["per_structure"][k]["hd95"][0] == 0.0
        # empty-pred case: dice 0, hd95 0 by the reference's convention
        assert s["per_structure"][k]["dice"][1] == 0.0
        assert s["per_structure"][k]["hd95"][1] == 0.0
    txt = (tmp_path / "dice_pre.txt").read_text()
    assert "Mean_Dice" in txt and "DSC:" in txt
