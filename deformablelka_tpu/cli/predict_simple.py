"""Batch prediction CLI.

Mirrors /root/reference/3D/d_lka_former/inference/predict_simple.py:33-…:
  predict_simple.py -i INPUT_FOLDER -o OUTPUT_FOLDER -m 3d_fullres -f 0
  [-chk model_final_checkpoint] [--step_size 0.5] [--disable_tta]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--input_folder", required=True)
    ap.add_argument("-o", "--output_folder", required=True)
    ap.add_argument("-m", "--model", default="3d_fullres")
    ap.add_argument("-f", "--folds", nargs="+", default=["0"])
    ap.add_argument("-chk", "--checkpoint_name",
                    default="model_final_checkpoint")
    ap.add_argument("-t", "--task_name", default="Task002_Synapse")
    ap.add_argument("--model_folder", required=True,
                    help="trainer output folder containing ckpt/")
    ap.add_argument("--step_size", type=float, default=0.5)
    ap.add_argument("--disable_tta", action="store_true")
    ap.add_argument("--trans_block",
                    default="TransformerBlock_3D_single_deform_LKA")
    ap.add_argument("--num_classes", type=int, default=14)
    ap.add_argument("--patch_size", type=int, nargs=3,
                    default=[64, 128, 128],
                    help="sliding-window patch (reference Synapse "
                         "default 64 128 128)")
    ap.add_argument("--norm", default="CT", choices=["CT", "nonCT"],
                    help="preprocessing normalization scheme "
                         "(preprocessing.py:276-316)")
    ap.add_argument("--target_spacing", type=float, nargs=3,
                    default=[3.0, 0.76, 0.76])
    ap.add_argument("--use_nonzero_mask", default="0", choices=["0", "1"],
                    help="normalize within the nonzero mask "
                         "(preprocessing.py:286-308). nnU-Net planners "
                         "commonly set this True for nonCT tasks that "
                         "were nonzero-cropped; it MUST match the value "
                         "the training pipeline used (the plan's "
                         "use_nonzero_mask), so it is exposed rather "
                         "than hard-coded.")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from deformablelka_tpu.models.dlka_former import dlka_former_synapse
    from deformablelka_tpu.training.checkpoint import CheckpointManager
    from deformablelka_tpu.data.preprocessing import GenericPreprocessor
    from deformablelka_tpu.inference.predictor3d import (
        Predictor3D, predict_from_folder)

    patch = tuple(args.patch_size)
    model = dlka_former_synapse(num_classes=args.num_classes, do_ds=False,
                                trans_block=args.trans_block,
                                img_size=patch)

    params_per_fold = []
    for fold in args.folds:
        ckpt = CheckpointManager(f"{args.model_folder}/fold_{fold}/ckpt")
        state, _ = ckpt.load(args.checkpoint_name, None)
        variables = {"params": state["params"]}
        if state.get("batch_stats"):
            variables["batch_stats"] = state["batch_stats"]
        params_per_fold.append(variables)

    intensity = None
    if args.norm == "CT":
        intensity = {0: {"percentile_00_5": -958, "percentile_99_5": 270,
                         "mean": 99.4, "sd": 77.9}}
    pre = GenericPreprocessor(
        normalization_schemes=[args.norm],
        use_nonzero_mask=[args.use_nonzero_mask == "1"],
        target_spacing=list(args.target_spacing),
        intensity_properties=intensity)

    def apply_fn(variables, x):
        return model.apply(variables, x)

    predictor = Predictor3D(apply_fn, params_per_fold, pre,
                            patch_size=patch,
                            num_classes=args.num_classes,
                            step_size=args.step_size,
                            do_mirroring=not args.disable_tta)
    predict_from_folder(predictor, args.input_folder, args.output_folder)


if __name__ == "__main__":
    main()
