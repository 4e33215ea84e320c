from deformablelka_tpu.evaluation.metrics import (
    dice,
    jaccard,
    hd95,
    assd,
    surface_distances,
    ConfusionMatrix,
)
