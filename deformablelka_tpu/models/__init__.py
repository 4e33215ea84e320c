"""Model zoo: 3D D-LKA Former (Synapse/ACDC/Pancreas), 2D MaxViT D-LKA Net,
ablation nets, and the registry."""

from deformablelka_tpu.models.dlka_former import (
    DLKAFormer,
    dlka_former_synapse,
    dlka_former_acdc,
    dlka_net_pancreas,
)
from deformablelka_tpu.models.maxvit_dlka import (
    MaxViTDeformableLKAFormer,
    maxvit_lka_former,
)
from deformablelka_tpu.models.generic_unet import (
    GenericUNet,
    generic_unet_3d_from_plans,
)
from deformablelka_tpu.models.daeformer import DAEFormer
from deformablelka_tpu.models.pancreas_baselines import (
    VNet,
    Resnet34Seg,
    UNETR,
)
from deformablelka_tpu.models.swinunet import SwinUNet
from deformablelka_tpu.models.dat_lka import DATLKAFormer
from deformablelka_tpu.models.mvit import MViT4Out, MViTLKAFormer
from deformablelka_tpu.models.dae_lka import DAELKAFormer
from deformablelka_tpu.models.transunet import TransUNet
from deformablelka_tpu.models.hiformer import HiFormer
from deformablelka_tpu.models.stvit import (
    STViT4Out,
    STVitLKA,
    SemanticSTViT,
)
from deformablelka_tpu.models.biformer import BiFormer3Out, BiDAEFormer
