"""NIH-Pancreas training CLI.

Mirrors /root/reference/3D/pancreas_code/train_pancreas.py:25-41 (argparse
surface) and :93-191 (engine wiring): D_LKA_Net 96³, h5 fold lists,
RandomCrop sampling, 6000 iterations.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root_path", required=True,
                    help="dataset base dir (holds Pancreas/Flods/*.list)")
    ap.add_argument("--exp", default="pancreas_dlka", help="experiment name")
    ap.add_argument("--output_dir", default="./model")
    ap.add_argument("--max_iterations", type=int, default=6000)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--labeled_bs", type=int, default=1)
    ap.add_argument("--base_lr", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=1337)
    ap.add_argument("--train_fold", default="train0.list")
    ap.add_argument("--patch_size", type=int, nargs=3, default=[96, 96, 96])
    ap.add_argument("--trans_block",
                    default="TransformerBlock_3D_single_deform_LKA")
    ap.add_argument("--model", default="dlka_net",
                    choices=["dlka_net", "vnet", "resnet34", "resseg3d",
                             "unetr", "unetr_mini"],
                    help="network: D-LKA Net or a pancreas "
                         "baseline (vnet.py / ResNet34.py / "
                         "unetr.py)")
    args = ap.parse_args(argv)

    from deformablelka_tpu.models.dlka_former import dlka_net_pancreas  # noqa: F401
    from deformablelka_tpu.cli._pancreas_models import build_pancreas_model
    from deformablelka_tpu.data.pancreas import (
        PancreasDataLoader, read_fold_list)
    from deformablelka_tpu.training.trainer_pancreas import TrainerPancreas

    cases = read_fold_list(args.root_path, args.train_fold)
    loader = PancreasDataLoader(cases, crop_size=tuple(args.patch_size),
                                batch_size=args.batch_size, seed=args.seed)
    model = build_pancreas_model(args.model, args.trans_block,
                                 tuple(args.patch_size))
    trainer = TrainerPancreas(
        model, out_dir=f"{args.output_dir}/{args.exp}",
        base_lr=args.base_lr, max_iterations=args.max_iterations,
        batch_size=args.batch_size, labeled_bs=args.labeled_bs,
        seed=args.seed)
    trainer.run_training(loader)


if __name__ == "__main__":
    main()
