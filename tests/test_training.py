"""Loss-function unit tests + multichip training-step dry run."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from deformablelka_tpu.training.losses import (
    SoftDiceLoss, cross_entropy, dc_and_ce_loss, deep_supervision_weights,
    dice_ce_2d_loss, poly_lr, topk_cross_entropy, generalized_dice_loss,
    downsample_labels)


def test_soft_dice_perfect_prediction():
    labels = np.random.RandomState(0).randint(0, 3, (2, 4, 4, 4))
    logits = jax.nn.one_hot(labels, 3) * 100.0
    loss = SoftDiceLoss(batch_dice=True, do_bg=False)(jnp.asarray(logits),
                                                      jnp.asarray(labels))
    assert float(loss) < -0.999  # -mean(dice) → -1 for perfect


def test_soft_dice_worst_prediction():
    labels = np.zeros((1, 4, 4, 4), np.int32)
    labels[0, :2] = 1
    logits = np.zeros((1, 4, 4, 4, 2), np.float32)
    logits[..., 0] = 100.0  # predict all background
    loss = SoftDiceLoss(batch_dice=True, do_bg=False)(jnp.asarray(logits),
                                                      jnp.asarray(labels))
    assert float(loss) > -1e-3  # dice ≈ 0


def test_cross_entropy_matches_uniform():
    logits = jnp.zeros((2, 3, 3, 4))
    labels = jnp.zeros((2, 3, 3), jnp.int32)
    assert np.isclose(float(cross_entropy(logits, labels)), np.log(4),
                      atol=1e-6)


def test_ds_weights():
    w = deep_supervision_weights(3)
    np.testing.assert_allclose(w, np.array([4, 2, 1]) / 7.0)


def test_downsample_labels():
    lab = np.arange(16).reshape(1, 4, 4)
    d = downsample_labels(lab, (2, 2))
    np.testing.assert_array_equal(d, [[[0, 2], [8, 10]]])


def test_poly_lr():
    assert np.isclose(poly_lr(0, 1000, 0.01), 0.01)
    assert poly_lr(999, 1000, 0.01) < 0.01 * 0.002


def test_other_losses_finite():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 4, 4, 4, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 3, (2, 4, 4, 4)))
    for l in (dc_and_ce_loss(logits, labels),
              dice_ce_2d_loss(logits[:, 0], labels[:, 0]),
              topk_cross_entropy(logits, labels),
              generalized_dice_loss(logits, labels)):
        assert np.isfinite(float(l))


@pytest.mark.slow
def test_dryrun_multichip_8dev():
    """The driver's multichip validation path on the virtual CPU mesh."""
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_cascade_predict_next_stage_and_loader(tmp_path):
    """predict_next_stage writes segFromPrevStage files at the next
    stage's shapes; DataLoader3D appends them as one-hot channels."""
    import pickle
    import flax.linen as nn
    from deformablelka_tpu.data.dataset import DataLoader3D, load_dataset
    from deformablelka_tpu.training.cascade import predict_next_stage

    rng = np.random.RandomState(0)
    low = tmp_path / "lowres"
    full = tmp_path / "fullres"
    low.mkdir()
    full.mkdir()
    for case, (ls, fs) in {"caseA": ((10, 12, 10), (20, 24, 20)),
                           "caseB": ((8, 10, 12), (16, 20, 24))}.items():
        for folder, shape in ((low, ls), (full, fs)):
            img = rng.randn(1, *shape).astype(np.float32)
            seg = (rng.rand(1, *shape) > 0.7).astype(np.float32)
            np.savez_compressed(folder / f"{case}.npz",
                                data=np.concatenate([img, seg]))
            with open(folder / f"{case}.pkl", "wb") as f:
                pickle.dump({"class_locations": {}}, f)

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(2, (3, 3, 3))(x)

    model = Tiny()
    patch = (8, 8, 8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *patch, 1)))
    out_dir = tmp_path / "pred_next_stage"
    written = predict_next_stage(
        lambda v, x: model.apply(v, x), variables, low, full, out_dir,
        patch_size=patch, num_classes=2, do_mirroring=False)
    assert len(written) == 2
    segA = np.load(out_dir / "caseA_segFromPrevStage.npz")["data"]
    assert segA.shape == (20, 24, 20)  # next stage's shape
    assert segA.dtype == np.uint8

    loader = DataLoader3D(load_dataset(full), patch_size=(8, 8, 8),
                          batch_size=2,
                          seg_from_prev_stage_folder=out_dir,
                          cascade_classes=[1],
                          rng=np.random.RandomState(1))
    batch = loader.next()
    assert batch["data"].shape == (2, 8, 8, 8, 2)  # image + one-hot(1)
    assert set(np.unique(batch["data"][..., 1])) <= {0.0, 1.0}


def test_train_step_pins_gather_impl(monkeypatch):
    """The training trace must honour DLKA_DEFORM_IMPL_TRAIN regardless
    of the inference-session default (ops.deform_impl): the trained path
    is pinned at trace time so probes/escape hatches stay meaningful."""
    import deformablelka_tpu.ops as ops
    from deformablelka_tpu.nn.lka2d import deformableLKABlock
    from deformablelka_tpu.training.train_step import (
        init_train_state, make_sgd, make_train_step)
    import flax.linen as nn

    monkeypatch.setenv("DLKA_DEFORM_IMPL", "window")
    monkeypatch.setenv("DLKA_DEFORM_IMPL_TRAIN", "gather")
    calls = []
    real_gather, real_window = ops.deform_conv2d_gather, \
        ops.deform_conv2d_window
    monkeypatch.setattr(ops, "deform_conv2d_gather",
                        lambda *a, **k: calls.append("gather")
                        or real_gather(*a, **k))
    monkeypatch.setattr(ops, "deform_conv2d_window",
                        lambda *a, **k: calls.append("window")
                        or real_window(*a, **k))

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = deformableLKABlock(name="b")(x)
            return nn.Conv(3, (1, 1))(x)

    model = M()
    x = jnp.zeros((1, 8, 8, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    # inference trace under the env default uses the window impl
    assert "window" in calls and "gather" not in calls
    calls.clear()

    tx = make_sgd(lambda s: 1e-3)
    state = init_train_state(variables, tx)
    step = make_train_step(model.apply, tx, deep_supervision=False,
                           loss_fn=lambda out, lab: jnp.mean(out ** 2))
    batch = {"image": x, "label": jnp.zeros((1, 8, 8), jnp.int32)}
    jax.jit(step)(state, batch)  # traces loss_of under deform_impl
    assert "gather" in calls and "window" not in calls


def test_train_impl_default_is_hybrid(monkeypatch):
    """Default training impl is 'hybrid' since round 4: the pallas
    forward inside value_and_grad no longer crashes the remote
    compiler (probe_train_r4.py repro) and the flagship step measures
    3.404 s vs 3.565 for 'hybridw' (PERF.md "Round 4: training-step
    attack"). Exact for any offsets via the lax.cond dispatch;
    DLKA_DEFORM_IMPL_TRAIN=hybridw/gather are the escape hatches."""
    from deformablelka_tpu.ops import train_impl
    monkeypatch.delenv("DLKA_DEFORM_IMPL_TRAIN", raising=False)
    assert train_impl() == "hybrid"
    monkeypatch.setenv("DLKA_DEFORM_IMPL_TRAIN", "gather")
    assert train_impl() == "gather"
