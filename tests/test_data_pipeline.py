"""Dataset loader + augmentation tests."""

import numpy as np
import pytest

from deformablelka_tpu.data.dataset import (
    DataLoader3D, compute_class_locations, unpack_dataset, load_dataset)
from deformablelka_tpu.data.augment import (
    MoreDAAugmenter, ThreadedAugmenter, get_patch_size)


def _make_dataset(tmp_path, n_cases=3, shape=(20, 24, 24)):
    import pickle
    for i in range(n_cases):
        rng = np.random.RandomState(i)
        data = rng.randn(1, *shape).astype(np.float32)
        seg = np.zeros(shape, np.float32)
        seg[5:10, 5:10, 5:10] = 1
        seg[12:15, 12:15, 12:15] = 2
        arr = np.concatenate([data, seg[None]], 0)
        np.savez_compressed(tmp_path / f"case_{i}.npz", data=arr)
        props = {"class_locations": compute_class_locations(seg, [1, 2])}
        with open(tmp_path / f"case_{i}.pkl", "wb") as f:
            pickle.dump(props, f)
    return tmp_path


def test_dataloader3d_shapes_and_fg(tmp_path):
    _make_dataset(tmp_path)
    unpack_dataset(tmp_path)
    ds = load_dataset(tmp_path)
    assert len(ds) == 3
    loader = DataLoader3D(ds, patch_size=(12, 12, 12), batch_size=4,
                          oversample_foreground_percent=0.5,
                          rng=np.random.RandomState(0))
    batch = loader.next()
    assert batch["data"].shape == (4, 12, 12, 12, 1)
    assert batch["seg"].shape == (4, 12, 12, 12)
    # fg-forced samples must contain foreground
    fg_count = sum((batch["seg"][i] > 0).any() for i in (2, 3))
    assert fg_count >= 1


def test_patch_exceeding_volume(tmp_path):
    _make_dataset(tmp_path, n_cases=1, shape=(8, 8, 8))
    ds = load_dataset(tmp_path)
    loader = DataLoader3D(ds, patch_size=(16, 16, 16), batch_size=1,
                          rng=np.random.RandomState(0))
    batch = loader.next()
    assert batch["data"].shape == (1, 16, 16, 16, 1)
    assert (batch["seg"] == -1).any()  # padded border marker


def test_get_patch_size():
    ps = get_patch_size((64, 128, 128),
                        (-np.pi / 6, np.pi / 6), (-np.pi / 6, np.pi / 6),
                        (-np.pi / 6, np.pi / 6), (0.7, 1.4))
    assert all(p >= f for p, f in zip(ps, (64, 128, 128)))


def test_augmenter_end_to_end():
    rng = np.random.RandomState(0)
    enlarged = (18, 18, 18)
    aug = MoreDAAugmenter(final_patch_size=(12, 12, 12),
                          deep_supervision_scales=[[1, 1, 1],
                                                   [0.5, 0.5, 0.5]],
                          rng=np.random.RandomState(3))
    batch = {"data": rng.randn(2, *enlarged, 1).astype(np.float32),
             "seg": rng.randint(-1, 3, (2, *enlarged)).astype(np.float32)}
    out = aug(batch)
    assert out["data"].shape == (2, 12, 12, 12, 1)
    assert isinstance(out["target"], list) and len(out["target"]) == 2
    assert out["target"][0].shape == (2, 12, 12, 12)
    assert out["target"][1].shape == (2, 6, 6, 6)
    assert (out["target"][0] >= 0).all()  # -1 removed
    assert np.isfinite(out["data"]).all()


def test_threaded_augmenter(tmp_path):
    _make_dataset(tmp_path)
    ds = load_dataset(tmp_path)
    loader = DataLoader3D(ds, patch_size=(16, 16, 16), batch_size=2,
                          rng=np.random.RandomState(0))
    aug = MoreDAAugmenter(final_patch_size=(12, 12, 12),
                          rng=np.random.RandomState(1))

    def transform(batch):
        return aug({"data": batch["data"], "seg": batch["seg"]})

    ta = ThreadedAugmenter(loader, transform, num_workers=2)
    for _ in range(3):
        b = ta.next()
        assert b["data"].shape == (2, 12, 12, 12, 1)
    ta.stop()


def test_dataloader2d_shapes_fg_and_padding(tmp_path):
    """DataLoader2D (dataset_loading.py:382-595): random-slice 2D
    patches, fg-forced slice selection, edge-pad data / -1-pad seg."""
    from deformablelka_tpu.data.dataset import DataLoader2D

    _make_dataset(tmp_path)
    ds = load_dataset(tmp_path)
    loader = DataLoader2D(ds, patch_size=(16, 16), batch_size=4,
                          oversample_foreground_percent=0.5,
                          rng=np.random.RandomState(0))
    batch = loader.next()
    assert batch["data"].shape == (4, 16, 16, 1)
    assert batch["seg"].shape == (4, 16, 16)
    # fg-forced samples (last 2 of 4 at 50%) must contain foreground
    assert sum((batch["seg"][i] > 0).any() for i in (2, 3)) == 2

    # patch larger than the slice: data edge-padded (finite), seg -1
    big = DataLoader2D(ds, patch_size=(40, 40), batch_size=1,
                       rng=np.random.RandomState(0))
    b = big.next()
    assert b["data"].shape == (1, 40, 40, 1)
    assert np.isfinite(b["data"]).all()
    assert (b["seg"] == -1).any()


def test_generic_unet_2d_config():
    """The nnUNet `2d` configuration network (GenericUNet ndim=2)."""
    import jax
    import jax.numpy as jnp
    from deformablelka_tpu.models.generic_unet import GenericUNet

    # batch 1 @ 16^2 (was 2 @ 32^2): same three-scale DS assertion,
    # ~4x cheaper on the 1-CPU fast suite (59.7 s -> suite-trim r5)
    m = GenericUNet(num_classes=3, ndim=2, num_pool=3,
                    base_num_features=4, do_ds=True)
    x = jnp.zeros((1, 16, 16, 1))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape for o in outs] == [(1, 16, 16, 3), (1, 8, 8, 3),
                                       (1, 4, 4, 3)]
