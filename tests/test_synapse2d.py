"""2D Synapse slice dataset: npz/h5 round trip, augmentation, batching."""

import numpy as np
import pytest

from deformablelka_tpu.data.synapse2d import (
    SynapseDataset2D, SynapseLoader2D, SliceAugmenter, zoom_to,
    normalize_05, _one_hot_argmax_warp)


def _make_synapse2d(tmp_path, n_slices=5, n_vols=2, hw=48):
    data = tmp_path / "data"
    lists = tmp_path / "lists"
    data.mkdir()
    lists.mkdir()
    rng = np.random.RandomState(0)
    names = []
    for i in range(n_slices):
        name = f"case0001_slice{i:03d}"
        img = rng.rand(hw, hw).astype(np.float32)
        lab = rng.randint(0, 9, size=(hw, hw)).astype(np.uint8)
        np.savez(data / f"{name}.npz", image=img, label=lab)
        names.append(name)
    (lists / "train.txt").write_text("\n".join(names))
    import h5py
    vols = []
    for i in range(n_vols):
        name = f"case{i:04d}"
        with h5py.File(data / f"{name}.npy.h5", "w") as f:
            f["image"] = rng.rand(7, hw, hw).astype(np.float32)
            f["label"] = rng.randint(0, 9, (7, hw, hw)).astype(np.uint8)
        vols.append(name)
    (lists / "test_vol.txt").write_text("\n".join(vols))
    return data, lists


def test_train_slices_and_batches(tmp_path):
    data, lists = _make_synapse2d(tmp_path)
    ds = SynapseDataset2D(data, lists, "train", img_size=32)
    s = ds.get(0)
    assert s["image"].shape == (32, 32, 1)
    assert s["label"].shape == (32, 32)
    assert s["label"].dtype == np.int32
    loader = SynapseLoader2D(ds, batch_size=2)
    b = loader.next()
    assert b["image"].shape == (2, 32, 32, 1)
    assert b["label"].shape == (2, 32, 32)
    # loops forever
    for _ in range(5):
        loader.next()


def test_test_volumes(tmp_path):
    data, lists = _make_synapse2d(tmp_path)
    ds = SynapseDataset2D(data, lists, "test_vol", img_size=32)
    s = ds.get(0)
    assert s["image"].shape == (7, 48, 48)
    assert s["case_name"] == "case0000"


def test_augmenter_preserves_labels():
    rng = np.random.RandomState(0)
    img = rng.rand(40, 40).astype(np.float32)
    lab = np.zeros((40, 40))
    lab[10:30, 10:30] = 3
    aug = SliceAugmenter(np.random.RandomState(3))
    for _ in range(10):
        ai, al = aug(img, lab)
        assert ai.shape == img.shape
        assert set(np.unique(al)).issubset({0.0, 3.0})


def test_zoom_and_normalize():
    img = np.random.RandomState(0).rand(30, 40).astype(np.float32)
    lab = np.random.RandomState(1).randint(0, 4, (30, 40))
    zi, zl = zoom_to(img, lab, (24, 24))
    assert zi.shape == (24, 24) and zl.shape == (24, 24)
    assert set(np.unique(zl)).issubset(set(np.unique(lab)))
    n = normalize_05(np.zeros((4, 4)))
    assert np.allclose(n, -1.0)


def test_one_hot_argmax_warp_ties():
    lab = np.array([[0, 1], [2, 3]], np.float32)
    out = _one_hot_argmax_warp(lab, lambda a: a, num_classes=4)
    np.testing.assert_array_equal(out, lab)
