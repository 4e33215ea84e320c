"""Skin-lesion training CLI (ISIC 2017/2018, PH2).

Mirrors /root/reference/2D/skin_code/train_skin_2017.py:25-152: npy data
dir from Prepare_*.py, MaxViT D-LKA Net with num_classes=1, BCE loss,
SGD + ReduceLROnPlateau, best-val-loss checkpoint.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root_path", required=True,
                    help="dir with data_/mask_{train,val,test}.npy")
    ap.add_argument("--output_dir", default="./model_skin")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--max_epochs", type=int, default=100)
    ap.add_argument("--base_lr", type=float, default=1e-3)
    ap.add_argument("--img_size", type=int, default=224)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--no_deform", action="store_true",
                    help="LKA baseline decoder")
    ap.add_argument("--model", default=None,
                    help="skin baseline from models/registry "
                         "(transunet, hiformer, swinunet, ...)")
    args = ap.parse_args(argv)

    from deformablelka_tpu.data.skin import ISICLoader
    from deformablelka_tpu.models.maxvit_dlka import (
        MaxViTDeformableLKAFormer)
    from deformablelka_tpu.training.trainer2d import TrainerSkin

    train_loader = ISICLoader(args.root_path, "train",
                              batch_size=args.batch_size, seed=args.seed)
    val_loader = ISICLoader(args.root_path, "val", batch_size=1)
    if args.model:
        from deformablelka_tpu.models.registry import build_model_2d
        model = build_model_2d(args.model, num_classes=1,
                               img_size=args.img_size)
    else:
        model = MaxViTDeformableLKAFormer(num_classes=1,
                                          img_size=args.img_size,
                                          deformable=not args.no_deform)
    trainer = TrainerSkin(model, args.output_dir, base_lr=args.base_lr,
                          max_epochs=args.max_epochs, seed=args.seed)
    trainer.run_training(train_loader, val_loader)
    print(f"best val loss: {trainer.best_val_loss:.4f}")


if __name__ == "__main__":
    main()
