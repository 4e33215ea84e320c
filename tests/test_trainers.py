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
