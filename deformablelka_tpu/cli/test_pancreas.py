"""NIH-Pancreas evaluation CLI.

Mirrors /root/reference/3D/pancreas_code/test_pancreas.py:14-70: load the
iteration-6000 checkpoint, run stride-16 sliding-window inference over the
test fold, report mean (dice, jaccard, hd95, asd).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root_path", required=True)
    ap.add_argument("--model_dir", required=True,
                    help="dir holding the orbax checkpoint")
    ap.add_argument("--checkpoint", default="d_lka_former_iter_6000")
    ap.add_argument("--test_fold", default="test0.list")
    ap.add_argument("--save_dir", default=None)
    ap.add_argument("--patch_size", type=int, nargs=3, default=[96, 96, 96])
    ap.add_argument("--stride_xy", type=int, default=16)
    ap.add_argument("--stride_z", type=int, default=16)
    ap.add_argument("--trans_block",
                    default="TransformerBlock_3D_single_deform_LKA")
    ap.add_argument("--model", default="dlka_net",
                    choices=["dlka_net", "vnet", "resnet34", "resseg3d",
                             "unetr", "unetr_mini"],
                    help="network: D-LKA Net or a pancreas "
                         "baseline (vnet.py / ResNet34.py / "
                         "unetr.py)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from deformablelka_tpu.models.dlka_former import dlka_net_pancreas  # noqa: F401
    from deformablelka_tpu.cli._pancreas_models import build_pancreas_model
    from deformablelka_tpu.data.pancreas import read_fold_list
    from deformablelka_tpu.inference.pancreas import (
        make_pancreas_sliding_window, test_all_case)
    from deformablelka_tpu.training.checkpoint import CheckpointManager

    model = build_pancreas_model(args.model, args.trans_block,
                                 tuple(args.patch_size))
    x0 = jnp.zeros((1, *args.patch_size, 1), jnp.float32)
    template = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    target = {"params": template["params"], "step": 0}
    if "batch_stats" in template:
        target["batch_stats"] = template["batch_stats"]
    mgr = CheckpointManager(args.model_dir)
    state, _ = mgr.load(args.checkpoint, target)

    def apply_fn(variables, x):
        return model.apply(variables, x.astype(jnp.bfloat16))

    sw = make_pancreas_sliding_window(
        apply_fn, patch_size=tuple(args.patch_size),
        stride_xy=args.stride_xy, stride_z=args.stride_z)
    cases = read_fold_list(args.root_path, args.test_fold)
    variables = {"params": state["params"]}
    if "batch_stats" in state:
        variables["batch_stats"] = state["batch_stats"]
    avg = test_all_case(sw, variables, cases, save_dir=args.save_dir)
    print(f"dice={avg[0]:.4f} jaccard={avg[1]:.4f} "
          f"hd95={avg[2]:.2f} asd={avg[3]:.2f}")


if __name__ == "__main__":
    main()
