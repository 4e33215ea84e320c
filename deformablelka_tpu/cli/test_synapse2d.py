"""2D Synapse evaluation CLI.

Mirrors /root/reference/2D/test.py:19-140: load the trained checkpoint,
run the per-volume slice-loop inference over test_vol.txt h5 cases,
report per-class and mean Dice/HD95, optionally dump NIfTI predictions.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--volume_path", required=True,
                    help="dir with <case>.npy.h5 volumes")
    ap.add_argument("--list_dir", required=True)
    ap.add_argument("--output_dir", required=True,
                    help="training output dir holding ckpt/")
    ap.add_argument("--checkpoint", default="best_model")
    ap.add_argument("--num_classes", type=int, default=9)
    ap.add_argument("--img_size", type=int, default=224)
    ap.add_argument("--is_savenii", action="store_true")
    ap.add_argument("--test_save_dir", default="./predictions")
    ap.add_argument("--no_deform", action="store_true")
    ap.add_argument("--model", default=None,
                    help="registry name of the ablation model the "
                         "checkpoint was trained with (models/registry)")
    args = ap.parse_args(argv)

    from pathlib import Path
    import numpy as np
    import jax
    import jax.numpy as jnp

    from deformablelka_tpu.data.synapse2d import SynapseDataset2D
    from deformablelka_tpu.models.maxvit_dlka import (
        MaxViTDeformableLKAFormer)
    from deformablelka_tpu.inference.predictor2d import Predictor2D
    from deformablelka_tpu.training.checkpoint import CheckpointManager

    if args.model:
        from deformablelka_tpu.models.registry import build_model_2d
        model = build_model_2d(args.model, num_classes=args.num_classes,
                               img_size=args.img_size)
    else:
        model = MaxViTDeformableLKAFormer(
            num_classes=args.num_classes, img_size=args.img_size,
            deformable=not args.no_deform)
    x0 = jnp.zeros((1, args.img_size, args.img_size, 1), jnp.float32)
    template = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    mgr = CheckpointManager(Path(args.output_dir) / "ckpt")
    state, _ = mgr.load(args.checkpoint,
                        {"params": template["params"],
                         "batch_stats": template.get("batch_stats", {})})
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]

    predictor = Predictor2D(lambda v, x: model.apply(v, x), variables,
                            patch_size=(args.img_size, args.img_size),
                            num_classes=args.num_classes)
    ds = SynapseDataset2D(args.volume_path, args.list_dir, "test_vol",
                          img_size=args.img_size)
    per_case = []
    for i in range(len(ds)):
        s = ds.get(i)
        pred, per_class = predictor.evaluate_case(s["image"], s["label"])
        md = float(np.mean([d for d, _ in per_class]))
        mh = float(np.mean([h for _, h in per_class]))
        per_case.append((md, mh))
        print(f"{s['case_name']}: mean_dice {md:.4f} mean_hd95 {mh:.2f}")
        if args.is_savenii:
            from deformablelka_tpu.data import nifti
            Path(args.test_save_dir).mkdir(parents=True, exist_ok=True)
            nifti.save(pred.astype(np.float32),
                       Path(args.test_save_dir)
                       / f"{s['case_name']}_pred.nii.gz")
    md = float(np.mean([d for d, _ in per_case]))
    mh = float(np.mean([h for _, h in per_case]))
    print(f"Testing performance: mean_dice {md:.4f} mean_hd95 {mh:.2f}")


if __name__ == "__main__":
    main()
