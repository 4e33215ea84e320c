"""find_lr sweep, Ranger optimizer, sanity checks, profiling utils."""

import json
from pathlib import Path

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
import pytest

from deformablelka_tpu.training.train_step import make_ranger
from deformablelka_tpu.training.trainer3d import Trainer3D
from deformablelka_tpu.utils.profiling import (
    cost_analysis, count_params, latency_bench)
from deformablelka_tpu.data import nifti
from deformablelka_tpu.data.sanity_checks import (
    verify_dataset_integrity, verify_same_geometry)


class Tiny3D(nn.Module):
    ncls: int = 3

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(8, (3, 3, 3))(x)
        h = nn.relu(h)
        full = nn.Conv(self.ncls, (1, 1, 1))(h)
        return [full, full[:, ::2, ::2, ::2], full[:, ::4, ::4, ::4]]


class _Gen:
    def __init__(self, seed=0):
        self.rng = np.random.RandomState(seed)

    def next(self):
        data = self.rng.randn(2, 8, 8, 8, 1).astype(np.float32)
        seg = (data[..., 0] > 0).astype(np.int32)
        return {"data": data,
                "target": [seg, seg[:, ::2, ::2, ::2],
                           seg[:, ::4, ::4, ::4]]}


def test_find_lr_sweep(tmp_path):
    tr = Trainer3D(Tiny3D(), tmp_path, _Gen(), max_num_epochs=1,
                   num_batches_per_epoch=2, num_val_batches_per_epoch=1)
    log_lrs, losses = tr.find_lr(num_iters=30, init_value=1e-5,
                                 final_value=10.0,
                                 plot_file=tmp_path / "lr.png")
    assert len(log_lrs) == len(losses)
    assert 2 < len(losses) <= 30
    # lr grid is exponential: log-lrs increase linearly
    d = np.diff(log_lrs)
    assert np.allclose(d, d[0], atol=1e-6)
    assert (tmp_path / "lr.png").exists()


def test_ranger_optimizer_steps():
    tx = make_ranger(1e-2, weight_decay=1e-4)
    params = optax.LookaheadParams.init_synced(
        {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)})
    state = tx.init(params)

    def loss(p):
        return jnp.sum((p["w"] @ jnp.ones(4) + p["b"] - 1.0) ** 2)

    for _ in range(8):
        grads = jax.grad(lambda fast: loss(fast))(params.fast)
        updates, state = tx.update(
            optax.LookaheadParams(fast=grads, slow=jax.tree_util.tree_map(
                jnp.zeros_like, grads)).fast if False else grads,
            state, params)
        params = optax.apply_updates(params, updates)
    assert float(loss(params.slow)) < float(loss(
        {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)}))


def test_cost_analysis_and_params():
    def f(a, b):
        return a @ b
    a = jnp.ones((64, 64)); b = jnp.ones((64, 64))
    ca = cost_analysis(f, a, b)
    assert ca.get("flops", 0) >= 2 * 64 * 64 * 64 * 0.9
    assert count_params({"w": np.ones((3, 4)), "b": np.ones(4)}) == 16


def test_latency_bench_runs():
    def f(x):
        return x * 2
    r = latency_bench(f, (jnp.ones((128, 128)),), warmup=2, reps=20,
                      inner=5)
    assert r["mean_ms"] > 0 and np.isfinite(r["std_ms"])


def _make_raw_dataset(root, n=2, bad_label=False, with_nan=False):
    (root / "imagesTr").mkdir(parents=True)
    (root / "labelsTr").mkdir()
    rng = np.random.RandomState(0)
    training = []
    for i in range(n):
        ident = f"case_{i:03d}"
        img = rng.randn(8, 8, 6).astype(np.float32)
        if with_nan and i == 0:
            img[0, 0, 0] = np.nan
        lab = rng.randint(0, 3, size=(8, 8, 6)).astype(np.uint8)
        if bad_label and i == 0:
            lab[0, 0, 0] = 7
        nifti.save(img, root / "imagesTr" / f"{ident}_0000.nii.gz")
        nifti.save(lab, root / "labelsTr" / f"{ident}.nii.gz")
        training.append({"image": f"./imagesTr/{ident}.nii.gz",
                         "label": f"./labelsTr/{ident}.nii.gz"})
    (root / "dataset.json").write_text(json.dumps({
        "labels": {"0": "bg", "1": "a", "2": "b"},
        "modality": {"0": "CT"},
        "training": training}))


def test_verify_dataset_integrity_ok(tmp_path):
    _make_raw_dataset(tmp_path)
    rep = verify_dataset_integrity(tmp_path)
    assert rep["n_cases"] == 2
    assert rep["labels"] == [0, 1, 2]


def test_verify_dataset_integrity_bad_label(tmp_path):
    _make_raw_dataset(tmp_path, bad_label=True)
    with pytest.raises(AssertionError):
        verify_dataset_integrity(tmp_path)


def test_verify_dataset_integrity_nan(tmp_path):
    _make_raw_dataset(tmp_path, with_nan=True)
    with pytest.raises(RuntimeError):
        verify_dataset_integrity(tmp_path)
