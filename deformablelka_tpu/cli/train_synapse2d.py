"""2D Synapse training CLI.

Mirrors /root/reference/2D/train_MaxViT_deform_LKA.py:20-127 (argparse
surface, seeding, model build + param/FLOP printout) and
trainer_MaxViT_deform_LKA.py:72-213 (SGD momentum 0.9 wd 1e-4,
0.4·CE + 0.6·Dice, per-iteration poly LR, eval every eval_interval
epochs after half the run).
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root_path", required=True,
                    help="dir with per-slice npz files")
    ap.add_argument("--list_dir", required=True,
                    help="dir with train.txt / test_vol.txt")
    ap.add_argument("--volume_path", default=None,
                    help="dir with test .npy.h5 volumes (for eval hook)")
    ap.add_argument("--output_dir", default="./model_out")
    ap.add_argument("--num_classes", type=int, default=9)
    ap.add_argument("--max_epochs", type=int, default=400)
    ap.add_argument("--batch_size", type=int, default=24)
    ap.add_argument("--base_lr", type=float, default=0.05)
    ap.add_argument("--img_size", type=int, default=224)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--eval_interval", type=int, default=20)
    ap.add_argument("--no_deform", action="store_true",
                    help="train the LKA baseline decoder")
    ap.add_argument("--model", default=None,
                    help="registry name of an ablation model to train "
                         "instead of the MaxViT D-LKA flagship (see "
                         "models/registry.py: daeformer, dae_lka, "
                         "mvit_lka, dat_lka, stvit_lka, semantic_stvit, "
                         "bidaeformer, swinunet, segformer, ...)")
    ap.add_argument("--pretrained_backbone", default=None,
                    help="torch MaxViT .pth to warm-start the encoder")
    args = ap.parse_args(argv)

    import numpy as np
    import jax

    from deformablelka_tpu.data.synapse2d import (
        SynapseDataset2D, SynapseLoader2D)
    from deformablelka_tpu.models.maxvit_dlka import (
        MaxViTDeformableLKAFormer)
    from deformablelka_tpu.training.trainer2d import Trainer2D
    from deformablelka_tpu.utils.profiling import count_params

    np.random.seed(args.seed)

    ds = SynapseDataset2D(args.root_path, args.list_dir, "train",
                          img_size=args.img_size, seed=args.seed,
                          num_classes=args.num_classes)
    loader = SynapseLoader2D(ds, args.batch_size)
    if args.model:
        from deformablelka_tpu.models.registry import build_model_2d
        model = build_model_2d(args.model, num_classes=args.num_classes,
                               img_size=args.img_size)
    else:
        model = MaxViTDeformableLKAFormer(
            num_classes=args.num_classes, img_size=args.img_size,
            deformable=not args.no_deform, deterministic=True)

    eval_hook = None
    if args.volume_path:
        from deformablelka_tpu.inference.predictor2d import Predictor2D

        vol_ds = SynapseDataset2D(args.volume_path, args.list_dir,
                                  "test_vol", img_size=args.img_size)

        def eval_hook(trainer):
            pred = Predictor2D(
                lambda v, x: trainer.model.apply(v, x),
                {"params": trainer.state.params},
                patch_size=(args.img_size, args.img_size),
                num_classes=args.num_classes)
            dices = []
            for i in range(len(vol_ds)):
                s = vol_ds.get(i)
                _, per_class = pred.evaluate_case(s["image"], s["label"])
                dices.append(np.mean([d for d, _ in per_class]))
            print(f"eval epoch {trainer.epoch}: mean dice "
                  f"{np.mean(dices):.4f}")

    # tensorboardX log dir mirrors the reference's
    # SummaryWriter(snapshot_path + '/log')
    # (trainer_MaxViT_deform_LKA.py:116)
    trainer = Trainer2D(model, args.output_dir, loader,
                        base_lr=args.base_lr, max_epochs=args.max_epochs,
                        iterations_per_epoch=loader.num_batches,
                        eval_hook=eval_hook,
                        eval_interval=args.eval_interval,
                        tensorboard_dir=str(Path(args.output_dir) /
                                            "log"))
    if args.pretrained_backbone:
        from deformablelka_tpu.convert.torch_loader import (
            load_maxvit_backbone)
        first = loader.next()
        trainer.initialize(first)
        trainer.state = trainer.state._replace(
            params=load_maxvit_backbone(args.pretrained_backbone,
                                        trainer.state.params))
    trainer.run_training()


if __name__ == "__main__":
    main()
