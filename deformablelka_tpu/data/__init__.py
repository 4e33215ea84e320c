from deformablelka_tpu.data.preprocessing import (
    crop_to_nonzero,
    resample_patient,
    ct_normalize,
    GenericPreprocessor,
)
