"""Trainer smoke tests: a few steps on tiny models, loss decreases,
checkpoint roundtrip."""

import numpy as np
import pytest
import flax.linen as nn
import jax.numpy as jnp

from deformablelka_tpu.training.trainer3d import Trainer3D
from deformablelka_tpu.training.trainer2d import Trainer2D


class Tiny3D(nn.Module):
    ncls: int = 3

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(8, (3, 3, 3))(x)
        h = nn.relu(h)
        full = nn.Conv(self.ncls, (1, 1, 1))(h)
        half = full[:, ::2, ::2, ::2]
        quarter = full[:, ::4, ::4, ::4]
        return [full, half, quarter]


class _Gen3D:
    def __init__(self, seed=0):
        self.rng = np.random.RandomState(seed)

    def next(self):
        data = self.rng.randn(2, 8, 8, 8, 1).astype(np.float32)
        seg = (data[..., 0] > 0).astype(np.int32) + \
            (data[..., 0] > 1).astype(np.int32)
        return {"data": data,
                "target": [seg, seg[:, ::2, ::2, ::2],
                           seg[:, ::4, ::4, ::4]]}


def test_trainer3d_smoke(tmp_path):
    tr = Trainer3D(Tiny3D(), tmp_path, _Gen3D(), val_gen=_Gen3D(1),
                   max_num_epochs=2, num_batches_per_epoch=4,
                   num_val_batches_per_epoch=2, save_every=1)
    tr.run_training()
    assert len(tr.all_tr_losses) == 2
    assert tr.all_tr_losses[-1] < tr.all_tr_losses[0] + 0.5
    assert tr.ckpt.exists("model_final_checkpoint")
    # resume roundtrip
    tr2 = Trainer3D(Tiny3D(), tmp_path, _Gen3D(), max_num_epochs=2,
                    num_batches_per_epoch=4, num_val_batches_per_epoch=2)
    tr2.initialize(_Gen3D().next())
    tr2.load_checkpoint("model_final_checkpoint")
    assert tr2.epoch == 2


class Tiny2D(nn.Module):
    ncls: int = 2

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(8, (3, 3))(x)
        h = nn.relu(h)
        return nn.Conv(self.ncls, (1, 1))(h)


class _Gen2D:
    num_batches = 4

    def __init__(self):
        self.rng = np.random.RandomState(0)

    def next(self):
        img = self.rng.randn(2, 16, 16, 1).astype(np.float32)
        lab = (img[..., 0] > 0).astype(np.int32)
        return {"image": img, "label": lab}


def test_trainer2d_smoke(tmp_path):
    tr = Trainer2D(Tiny2D(), tmp_path, _Gen2D(), max_epochs=2,
                   iterations_per_epoch=4)
    tr.run_training()
    assert len(tr.losses) == 2
    assert tr.ckpt.exists("best_model")


def test_trainer2d_tensorboard_logging(tmp_path):
    """tensorboard_dir writes event files with lr/loss scalars and
    train image panels (trainer_MaxViT_deform_LKA.py:116,150-174)."""
    pytest.importorskip("tensorboardX")
    import flax.linen as nn
    from deformablelka_tpu.training.trainer2d import Trainer2D

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(3, (3, 3))(x)

    class Gen:
        def __init__(self):
            self.rng = np.random.RandomState(0)
            self.num_batches = 20

        def next(self):
            return {"image": self.rng.rand(2, 16, 16, 1).astype("f4"),
                    "label": self.rng.randint(0, 3, (2, 16, 16))}

    tr = Trainer2D(Tiny(), tmp_path / "out", Gen(), max_epochs=1,
                   iterations_per_epoch=21,
                   tensorboard_dir=tmp_path / "tb")
    tr.run_training()
    events = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > 0


def test_checkpoint_scheduled_policy_and_gc(tmp_path):
    """Scheduled model_ep_* cadence (network_trainer_synapse.py:546-556)
    + keep-policy GC + async-save join semantics."""
    from deformablelka_tpu.training.checkpoint import (
        CheckpointManager, should_save_scheduled)

    # cadence: post-increment epoch E saves iff E % save_every == 0
    # and E > warmup+1 (== pre-increment e > warmup).
    assert not should_save_scheduled(400, 50)
    assert not should_save_scheduled(401, 50)
    assert should_save_scheduled(450, 50)
    assert not should_save_scheduled(451, 50)
    assert should_save_scheduled(500, 50)
    # reference default save_every=30 (network_trainer_synapse.py:123)
    assert should_save_scheduled(420, 30)

    cm = CheckpointManager(tmp_path / "ck", max_scheduled_keep=2)
    state = {"w": jnp.arange(4.0)}
    for ep in (450, 500, 550):
        cm.save_scheduled(ep, state, {"epoch": ep})
    assert cm.scheduled_epochs() == [500, 550]  # 450 GC'd
    assert not (tmp_path / "ck" / "model_ep_450.json").exists()
    got, meta = cm.load("model_ep_550", state)
    assert meta["epoch"] == 550
    np.testing.assert_allclose(np.asarray(got["w"]), np.arange(4.0))

    # async save: overwrite same name twice back-to-back, then read.
    cm.save("model_latest", {"w": jnp.ones(4)})
    cm.save("model_latest", {"w": jnp.full(4, 2.0)})
    got, _ = cm.load("model_latest", state)
    np.testing.assert_allclose(np.asarray(got["w"]), 2.0)
    cm.wait_until_finished()


def test_trainer3d_scheduled_checkpoints(tmp_path):
    """Trainer writes model_ep_* past the warmup gate."""
    tr = Trainer3D(Tiny3D(), tmp_path, _Gen3D(),
                   max_num_epochs=4, num_batches_per_epoch=1,
                   num_val_batches_per_epoch=0, save_every=2,
                   checkpoint_warmup_epochs=1, max_scheduled_keep=1)
    tr.run_training()
    # epochs 2 and 4 hit save_every; both > warmup+1; keep cap 1 -> [4]
    assert tr.ckpt.scheduled_epochs() == [4]
