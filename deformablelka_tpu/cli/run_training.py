"""3D/2D training CLI.

Mirrors /root/reference/3D/d_lka_former/run/run_training.py:42-101:
  run_training.py 3d_fullres d_lka_former_trainer_synapse TASK FOLD
      [--continue_training] [-val] [--trans_block X] [--depths N]
      [--skip_connections N]

network=2d selects the nnUNet `2d` configuration (GenericUNet ndim=2 +
DataLoader2D random-slice sampling, dataset_loading.py:382-595) on the
same preprocessed 3D cases; any other network string keeps the 3D
flagship path (3d_fullres / 3d_lowres share the patch-based loader)."""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("network", help="e.g. 3d_fullres")
    ap.add_argument("network_trainer",
                    help="d_lka_former_trainer_synapse | _acdc")
    ap.add_argument("task", help="task id or name")
    ap.add_argument("fold", help="0-4 or 'all'")
    ap.add_argument("-val", "--validation_only", action="store_true")
    ap.add_argument("-c", "--continue_training", action="store_true")
    ap.add_argument("--trans_block",
                    default="TransformerBlock_3D_single_deform_LKA")
    ap.add_argument("--depths", type=int, default=3)
    ap.add_argument("--skip_connections", type=int, default=4)
    ap.add_argument("--plans_file", default=None)
    ap.add_argument("--preprocessed_folder", default=None)
    ap.add_argument("--output_folder", default=None)
    ap.add_argument("--max_epochs", type=int, default=1000)
    ap.add_argument("--patch_size", type=int, nargs=3, default=None,
                    help="override the task patch (reference default: "
                         "64 128 128 Synapse / 16 160 160 ACDC) — for "
                         "small datasets and smoke runs")
    ap.add_argument("--num_classes", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--batches_per_epoch", type=int, default=250)
    ap.add_argument("--val_batches_per_epoch", type=int, default=50)
    ap.add_argument("--no_remat", action="store_true",
                    help="disable per-block gradient rematerialisation")
    ap.add_argument("--da", default="moreDA",
                    choices=["moreDA", "insaneDA", "noDA"],
                    help="augmentation pipeline variant "
                         "(data_augmentation_{moreDA,insaneDA,noDA})")
    args = ap.parse_args(argv)

    from deformablelka_tpu.models.dlka_former import (
        dlka_former_synapse, dlka_former_acdc)
    from deformablelka_tpu.utils import paths
    from deformablelka_tpu.data.dataset import (
        load_dataset, unpack_dataset, DataLoader2D, DataLoader3D)
    from deformablelka_tpu.data.augment import (
        ThreadedAugmenter, get_augmentation, get_patch_size)
    from deformablelka_tpu.training.trainer3d import Trainer3D

    is_acdc = "acdc" in args.network_trainer
    is_2d = args.network == "2d"
    batch_size = args.batch_size
    num_classes = args.num_classes or (4 if is_acdc else 14)
    if is_2d:
        # nnUNet `2d` configuration: GenericUNet on random slices
        # (dataset_loading.py DataLoader2D; generic_UNet 2D config)
        from deformablelka_tpu.models.generic_unet import GenericUNet
        patch = tuple(args.patch_size)[-2:] if args.patch_size else \
            (256, 256)
        model = GenericUNet(num_classes=num_classes, ndim=2,
                            num_pool=5, do_ds=True)
    else:
        patch = tuple(args.patch_size) if args.patch_size else (
            (16, 160, 160) if is_acdc else (64, 128, 128))
        make_model = dlka_former_acdc if is_acdc else dlka_former_synapse
        # remat: without it a batch-2 step at the Synapse patch needs
        # 24.9 GB HBM (> one v5e chip); recompute costs ~1 extra fwd
        model = make_model(num_classes=num_classes, do_ds=True,
                           trans_block=args.trans_block,
                           deterministic=True,
                           img_size=patch, remat=not args.no_remat)

    pre_folder = args.preprocessed_folder or paths.preprocessed_folder()
    out_folder = Path(args.output_folder or
                      paths.results_folder()) / args.network_trainer / \
        f"fold_{args.fold}"

    if pre_folder is None:
        ap.error("set --preprocessed_folder or d_lka_former_preprocessed")
    unpack_dataset(pre_folder)
    dataset = load_dataset(pre_folder)
    # hardcoded 18/12 Synapse split (d_lka_former_trainer_synapse.py:348-354)
    keys = sorted(dataset.keys())
    n_train = max(1, int(len(keys) * 0.6)) if len(keys) != 30 else 18
    train_keys, val_keys = keys[:n_train], keys[n_train:]
    tr_ds = {k: dataset[k] for k in train_keys}
    vl_ds = {k: dataset[k] for k in (val_keys or train_keys)}

    rot = (-np.pi / 6, np.pi / 6)
    enlarged = get_patch_size(patch, rot, rot, rot, (0.7, 1.4))
    if is_2d:
        # GenericUNet DS heads: [full, 1/2, 1/4]
        ds_scales = [[1, 1], [0.5, 0.5], [0.25, 0.25]]
    else:
        # DS targets must match the model heads: out2 is at patch/stem,
        # out3 at patch/(2*stem) (DLKAFormer heads on dec1/dec2)
        stem = (1, 4, 4) if is_acdc else (2, 4, 4)
        ds_scales = [[1, 1, 1],
                     [1 / s for s in stem],
                     [1 / (2 * s) for s in stem]]

    def make_gen(ds, seed, train):
        loader_cls = DataLoader2D if is_2d else DataLoader3D
        loader = loader_cls(ds, enlarged if train else patch, batch_size,
                            rng=np.random.RandomState(seed))
        overrides = ({} if train else
                     dict(do_mirror=False, p_rot=0.0, p_scale=0.0,
                          do_elastic=False, do_intensity=False))
        if is_2d:
            # data is (B, H, W, C): never mirror the channel axis
            overrides["mirror_axes"] = (0, 1)
        aug = get_augmentation(
            args.da if train else "moreDA", patch,
            deep_supervision_scales=ds_scales,
            rng=np.random.RandomState(seed + 1), **overrides)
        return ThreadedAugmenter(loader, lambda b: aug(
            {"data": b["data"], "seg": b["seg"]}), num_workers=4)

    trainer = Trainer3D(model, out_folder,
                        make_gen(tr_ds, 1234, True),
                        make_gen(vl_ds, 5678, False),
                        max_num_epochs=args.max_epochs,
                        num_batches_per_epoch=args.batches_per_epoch,
                        num_val_batches_per_epoch=args.val_batches_per_epoch)
    if args.continue_training and trainer.ckpt.exists("model_latest"):
        trainer.initialize(trainer.train_gen.next())
        trainer.load_checkpoint("model_latest")
    if not args.validation_only:
        trainer.run_training()
    else:
        # -val (run_training.py:202-207 → Trainer_synapse.validate):
        # load the final checkpoint, sliding-window predict every val
        # case, aggregate dice/HD95 to validation/summary.json, decide
        # largest-CC postprocessing
        _validate(trainer, model, vl_ds, patch, num_classes, out_folder)
    return trainer


def _validate(trainer, model, val_dataset, patch, num_classes,
              out_folder):
    import jax
    import jax.numpy as jnp

    from deformablelka_tpu.data.dataset import load_case
    from deformablelka_tpu.evaluation.evaluator import aggregate_scores
    from deformablelka_tpu.evaluation.postprocessing import (
        determine_postprocessing)
    from deformablelka_tpu.inference.sliding_window import (
        SlidingWindowInference)

    trainer.initialize(trainer.val_gen.next())
    for name in ("model_final_checkpoint", "model_best", "model_latest"):
        if trainer.ckpt.exists(name):
            trainer.load_checkpoint(name)
            trainer.print_to_log_file(f"validating with {name}")
            break
    variables = {"params": trainer.state.params}
    if getattr(trainer.state, "batch_stats", None) is not None:
        variables["batch_stats"] = trainer.state.batch_stats

    def apply_fn(v, x):
        out = model.apply(v, x.astype(jnp.bfloat16))
        return out[0] if isinstance(out, (list, tuple)) else out

    sw = SlidingWindowInference(apply_fn, patch_size=patch,
                                num_classes=num_classes, step_size=0.5,
                                do_mirroring=True)
    val_dir = Path(out_folder) / "validation"
    val_dir.mkdir(parents=True, exist_ok=True)
    pairs = []
    import time as _time
    for case in sorted(val_dataset.keys()):
        data, _ = load_case(val_dataset[case])
        data = np.asarray(data)
        vol = np.moveaxis(np.asarray(data[:-1], np.float32), 0, -1)
        gt = data[-1].astype(np.int16)
        t0 = _time.time()
        seg = sw.predict_segmentation(variables, vol)
        trainer.print_to_log_file(
            f"{case}: predicted in {_time.time() - t0:.1f}s")
        np.savez_compressed(val_dir / f"{case}.npz",
                            data=seg.astype(np.uint8))
        pairs.append((seg, gt))
    labels = list(range(num_classes))
    summary = aggregate_scores(pairs, labels,
                               json_output_file=val_dir / "summary.json",
                               json_name=Path(out_folder).name)
    mean_fg = np.nanmean([summary["results"]["mean"][str(l)]["Dice"]
                          for l in labels[1:]])
    trainer.print_to_log_file(f"validation mean fg dice: {mean_fg:.4f}")
    determine_postprocessing(pairs, labels[1:],
                             out_json=val_dir / "postprocessing.json")
    return summary


if __name__ == "__main__":
    main()
