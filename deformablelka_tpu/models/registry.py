"""2D model registry — one name per reference ablation network.

Mirrors the reference's per-file model zoo (SURVEY.md §2.3: the
`2D/networks/*.py` and `2D/skin_code/model/*` ablations) as a flat
factory, so the train/test CLIs expose the paper's encoder/decoder axis
the way `--trans_block` exposes the 3D block axis.

Every entry is `name -> (num_classes, img_size) -> flax Module` whose
`__call__` maps (B, H, W, 1|3) NHWC inputs to (B, H, W, num_classes).
Models whose reference forward bakes in an output sigmoid (TransUNet)
are built with `apply_sigmoid=False` here so trainers always see
logits.
"""

from __future__ import annotations

from typing import Callable, Dict


def _maxvit_dlka(num_classes, img_size):
    from deformablelka_tpu.models.maxvit_dlka import (
        MaxViTDeformableLKAFormer)
    return MaxViTDeformableLKAFormer(num_classes=num_classes,
                                     img_size=img_size)


def _maxvit_lka(num_classes, img_size):
    from deformablelka_tpu.models.maxvit_dlka import maxvit_lka_former
    return maxvit_lka_former(num_classes=num_classes, img_size=img_size)


def _daeformer(num_classes, img_size):
    from deformablelka_tpu.models.daeformer import DAEFormer
    return DAEFormer(num_classes=num_classes)


def _dae_lka(num_classes, img_size):
    from deformablelka_tpu.models.dae_lka import DAELKAFormer
    return DAELKAFormer(num_classes=num_classes)


def _mvit_lka(num_classes, img_size):
    from deformablelka_tpu.models.mvit import MViTLKAFormer
    return MViTLKAFormer(num_classes=num_classes, img_size=img_size)


def _dat_lka(num_classes, img_size):
    from deformablelka_tpu.models.dat_lka import DATLKAFormer
    return DATLKAFormer(num_classes=num_classes)


def _swinunet(num_classes, img_size):
    from deformablelka_tpu.models.swinunet import SwinUNet
    return SwinUNet(num_classes=num_classes, img_size=img_size)


def _segformer(num_classes, img_size):
    from deformablelka_tpu.nn.segformer import SegFormer
    return SegFormer(num_classes=num_classes)


def _stvit_lka(num_classes, img_size):
    from deformablelka_tpu.models.stvit import STVitLKA
    return STVitLKA(num_classes=num_classes)


def _semantic_stvit(num_classes, img_size):
    from deformablelka_tpu.models.stvit import SemanticSTViT
    return SemanticSTViT(num_classes=num_classes)


def _bidaeformer(num_classes, img_size):
    from deformablelka_tpu.models.biformer import BiDAEFormer
    return BiDAEFormer(num_classes=num_classes)


def _transunet(num_classes, img_size):
    from deformablelka_tpu.models.transunet import TransUNet
    return TransUNet(num_classes=num_classes, img_size=img_size,
                     apply_sigmoid=False)


def _hiformer(num_classes, img_size):
    from deformablelka_tpu.models.hiformer import HiFormer
    return HiFormer(num_classes=num_classes, img_size=img_size)


MODELS_2D: Dict[str, Callable] = {
    # flagship + paper ablations (2D/networks/)
    "maxvit_deform_lka": _maxvit_dlka,   # MaxViT_deform_LKA.py
    "maxvit_lka": _maxvit_lka,           # MaxViT_LKA_Decoder.py
    "daeformer": _daeformer,             # DAEFormer.py
    "dae_lka": _dae_lka,                 # DAEEncoder_LKADecoder.py
    "mvit_lka": _mvit_lka,               # mvit_LKA_Decoder.py
    "dat_lka": _dat_lka,                 # DAT_LKA_Decoder.py
    "stvit_lka": _stvit_lka,             # STViTEncoder_LKADecoder.py
    "semantic_stvit": _semantic_stvit,   # STViTSegmentation.py
    "bidaeformer": _bidaeformer,         # BiEncoderDAEDecoder.py
    "swinunet": _swinunet,               # swinunet.py
    "segformer": _segformer,             # segformer.py
    # skin baselines (2D/skin_code/model/)
    "transunet": _transunet,             # vit_seg_modeling.py
    "hiformer": _hiformer,               # hiformer/
}


def build_model_2d(name: str, num_classes: int = 9, img_size: int = 224):
    """Build a 2D segmentation model by registry name."""
    try:
        factory = MODELS_2D[name]
    except KeyError:
        raise ValueError(
            f"unknown 2D model {name!r}; choose from "
            f"{sorted(MODELS_2D)}") from None
    return factory(num_classes, img_size)
