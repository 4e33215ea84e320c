from deformablelka_tpu.training.losses import (
    softmax_helper,
    SoftDiceLoss,
    dc_and_ce_loss,
    deep_supervision_loss,
    deep_supervision_weights,
    poly_lr,
)
