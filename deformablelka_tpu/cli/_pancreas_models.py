"""Pancreas model registry for the train/test CLIs.

The reference hardcodes D_LKA_Net in train_pancreas.py and keeps the
baselines (vnet.py, ResNet34.py, unetr.py) as separate files the user
swaps in by editing code; here they are one `--model` axis.
"""

from __future__ import annotations


def build_pancreas_model(name: str, trans_block: str, patch_size):
    if name == "dlka_net":
        from deformablelka_tpu.models.dlka_former import dlka_net_pancreas
        return dlka_net_pancreas(trans_block=trans_block,
                                 img_size=tuple(patch_size))
    from deformablelka_tpu.models.pancreas_baselines import (
        Resnet34Seg, UNETR, VNet)
    if name == "vnet":
        return VNet(n_classes=2)
    if name in ("resnet34", "resseg3d"):
        return Resnet34Seg(n_classes=2)
    if name in ("unetr", "unetr_mini"):
        return UNETR(n_classes=2, img_size=tuple(patch_size))
    raise KeyError(f"unknown pancreas model {name!r}")
